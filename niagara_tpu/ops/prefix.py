"""MXU prefix sums for the culling/compaction pipeline.

XLA lowers `jnp.cumsum` over a length-N vector to a logarithmic shift-add
scan: ~log2(N) full passes over the array (20 passes at N=1M), each a
read+write of the whole vector through HBM.  On this chip the compaction
prefix sums run at [D] = draw-count scale (reference drawcull.comp.glsl's
atomicAdd slot allocation, whose TPU replacement is prefix-sum + scatter,
see ops/cull.py build_task_commands), so the scan shows up as real frame
time.

The MXU form: reshape to [nb, 128] rows and multiply by a constant
triangular ones matrix — one matmul gives every within-row prefix, a
recursive pass over the nb row totals gives the row offsets.  Two to three
passes over the data total, and the triangular matmuls are exact in f32
for any counts below 2^24 (0/1 emission masks sum to at most N, and every
intermediate here is an integer-valued float well under that).

Callers pass i32 (or bool) and get i32 back; values must stay < 2^24.
"""

import functools

import jax
import jax.numpy as jnp

_LANE = 128


@functools.lru_cache(maxsize=None)
def _tri(n: int, inclusive: bool):
    # cached as NUMPY: a jnp array built under one jit trace must not be
    # cached and reused in another (UnexpectedTracerError); numpy constants
    # embed freshly into every trace
    import numpy as np

    i = np.arange(n)
    m = (i[:, None] <= i[None, :]) if inclusive else (i[:, None] < i[None, :])
    return m.astype(np.float32)


def _inclusive_f32(x):
    """Inclusive prefix sum of a 1D f32 integer-valued vector (< 2^24)."""
    n = x.shape[0]
    if n <= _LANE:
        return jax.lax.dot_general(
            x[None, :], _tri(n, True), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
    nb = -(-n // _LANE)
    xp = jnp.pad(x, (0, nb * _LANE - n)).reshape(nb, _LANE)
    within = jax.lax.dot_general(
        xp, _tri(_LANE, True), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [nb, 128] inclusive within each row
    totals = within[:, _LANE - 1]  # [nb] row sums
    offs = _inclusive_f32(totals) - totals  # exclusive row offsets
    return (within + offs[:, None]).reshape(-1)[:n]


def cumsum_i32(x):
    """`jnp.cumsum(x.astype(int32))` for 1D x, values summing to < 2^24.

    Same result, ~log2(N)/2 fewer HBM passes (matmul scan on the MXU).
    """
    return _inclusive_f32(x.astype(jnp.float32)).astype(jnp.int32)


def exclusive_i32(x):
    """Exclusive prefix sum of 1D x (i32/bool), total < 2^24."""
    xi = x.astype(jnp.int32)
    return cumsum_i32(xi) - xi
