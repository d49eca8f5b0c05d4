"""ops/prefix.py: MXU matmul prefix sums must match jnp.cumsum exactly.

These scans replace the XLA log-pass cumsum in the compaction pipeline
(ops/cull.py build_task_commands, ops/stream_compact.py) — the reference's
atomicAdd slot allocation (drawcull.comp.glsl:120-139) maps to prefix-sum +
scatter on TPU, so exactness here is exactness of command/cluster slots.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from niagara_tpu.ops import prefix


@pytest.mark.parametrize("n", [1, 7, 128, 129, 1000, 16384, 1 << 20, (1 << 20) + 77])
def test_cumsum_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 3, n).astype(np.int32)
    got = np.asarray(prefix.cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, dtype=np.int64).astype(np.int32))


@pytest.mark.parametrize("n", [64, 4096, 1 << 18])
def test_exclusive_binary_mask(n):
    rng = np.random.default_rng(n + 1)
    m = rng.random(n) < 0.03  # sparse emission mask, like draw culling
    got = np.asarray(prefix.exclusive_i32(jnp.asarray(m)))
    exp = np.cumsum(m.astype(np.int64)) - m.astype(np.int64)
    np.testing.assert_array_equal(got, exp.astype(np.int32))


def test_exactness_near_24bit_totals():
    # totals just under 2^24: the f32 matmul accumulation must stay exact
    n = 1 << 14
    x = np.full(n, 1023, np.int32)  # total 1023 * 16384 = 16,760,832 < 2^24
    got = np.asarray(prefix.cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, dtype=np.int64).astype(np.int32))
