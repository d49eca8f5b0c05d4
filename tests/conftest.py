"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests validate kernel/sharding logic on CPU; the real TPU chip is reserved
for bench.py.  Must set env before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


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
