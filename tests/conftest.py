"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests validate kernel/sharding logic on CPU; the real TPU chip is reserved
for bench.py.  Must set env before jax is imported anywhere.
"""

import os

# force CPU even if the environment pre-sets JAX_PLATFORMS=axon (real TPU):
# tests must not ride the chip tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# The env var alone is NOT enough here: the axon PJRT plugin registers at
# interpreter start (sitecustomize) and would win; the config flag forces the
# CPU backend even then.
jax.config.update("jax_platforms", "cpu")

# Compilation in this environment can stall on an external service with
# highly variable latency; a persistent on-disk cache makes reruns cheap.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def kitten_geometry():
    """Cooked kitten.obj (cached across the test session)."""
    from niagara_tpu.cooker import cook

    return cook.cook_obj_meshes(["/root/reference/data/kitten.obj"])


@pytest.fixture(scope="session")
def kitten_flat():
    from niagara_tpu.cooker import bindings

    return bindings.load_obj("/root/reference/data/kitten.obj")


@pytest.fixture
def rng():
    return np.random.default_rng(0x42)
