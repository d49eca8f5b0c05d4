"""Segmented stream compaction without full-scale scatters.

The classic TPU-side compaction (cumsum ranks + one scatter of every element)
pays scatter cost per ELEMENT — measured ~5-6ms per 1M updates on v5e — even
though only a few percent of elements survive.  This module replaces it with
a segmented scheme whose only full-scale work is cheap VPU bit packing:

  1. view the mask as [N/64, 64] segments and pack each segment's bits into
     two u32 words (weighted sums, pure VPU);
  2. per-segment popcount + exclusive cumsum gives each segment's base output
     slot; scatter ONE marker per segment ([N/64] updates, 64x fewer);
  3. a cumulative-max scan over the [capacity] output recovers each slot's
     owning segment, and the slot's distance from the marker is the ordinal
     of the survivor within the segment;
  4. the ordinal-th set bit of the segment's mask is selected with a
     [capacity, 64] prefix popcount (VPU, no scatter).

Plays the role of the reference's atomicAdd append loops
(drawcull.comp.glsl:120-139, clustercull.comp.glsl:133-139) at wavefront
scale.  Measured: 21.7ms -> 3.8ms for a [4.2M] -> [64K] compaction.
"""

import jax
import jax.numpy as jnp

from . import prefix

SEG = 64


def pack_bits64(bits2d):
    """[S, 64] bool -> two [S] u32 words (lanes 0-31, 32-63)."""
    b = bits2d.astype(jnp.uint32)
    weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    lo = jnp.sum(b[:, :32] * weights[None, :], axis=1, dtype=jnp.uint32)
    hi = jnp.sum(b[:, 32:] * weights[None, :], axis=1, dtype=jnp.uint32)
    return lo, hi


def expand_segments(lo, hi, pc, capacity):
    """Dense output slots from per-segment packed masks.

    lo/hi: [S] u32 packed survivor masks; pc: [S] i32 popcounts.
    Returns (seg [capacity], lane [capacity], live [capacity], total):
    output slot k holds the k-th survivor overall as (segment, lane); dead
    slots give (0, 0, False).
    """
    S = lo.shape[0]
    total = jnp.sum(pc)
    base = prefix.exclusive_i32(pc)  # MXU scan (ops/prefix.py)
    slot1 = jnp.where((pc > 0) & (base < capacity), base, capacity)
    mark = jnp.zeros(capacity, dtype=jnp.int32).at[slot1].set(
        jnp.arange(S, dtype=jnp.int32) + 1, mode="drop"
    )
    kpos = jnp.arange(capacity, dtype=jnp.int32)
    sp0 = jax.lax.cummax(jnp.where(mark > 0, kpos, -1))
    started = sp0 >= 0
    sp = jnp.where(started, sp0, 0)
    seg = jnp.maximum(mark[sp] - 1, 0)  # owning segment per output slot
    ordinal = kpos - sp  # survivor ordinal within the segment

    lanes = jnp.arange(SEG, dtype=jnp.int32)[None, :]
    wrd = jnp.where(lanes < 32, lo[seg][:, None], hi[seg][:, None])
    lbit = (wrd >> (lanes & 31).astype(jnp.uint32)) & 1
    # within-row prefix popcount as ONE [cap,64]x[64,64] triangular matmul
    # (values <= 64: exact in f32) instead of a log-pass lane scan
    pref = jax.lax.dot_general(
        lbit.astype(jnp.float32), prefix._tri(SEG, True),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    hit = (lbit > 0) & (pref - 1 == ordinal[:, None])
    lane = jnp.sum(jnp.where(hit, lanes, 0), axis=1)
    # slots between a capacity-dropped segment's base and the next marker
    # decode to ordinals past the owner's popcount and find no bit -> dead
    live = started & jnp.any(hit, axis=1) & (kpos < jnp.minimum(total, capacity))
    return jnp.where(live, seg, 0), jnp.where(live, lane, 0), live, total


def compact_mask_indices(mask, capacity):
    """Indices of the set elements of a flat bool mask, compacted.

    mask: [N] bool, N a multiple of 64.  Returns (idx [capacity] i32 — dead
    slots hold 0, n = min(count, capacity), overflow = max(count - cap, 0)).
    """
    m2 = mask.reshape(-1, SEG)
    lo, hi = pack_bits64(m2)
    pc = jnp.sum(m2, axis=1, dtype=jnp.int32)
    seg, lane, live, total = expand_segments(lo, hi, pc, capacity)
    idx = jnp.where(live, seg * SEG + lane, 0)
    return idx, jnp.minimum(total, capacity), jnp.maximum(total - capacity, 0)
