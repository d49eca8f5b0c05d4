"""Depth pyramid (HiZ) construction.

Reference: depthreduce.comp.glsl + niagara.cpp:1339-1344, 1703-1733.  The
pyramid base is previousPow2 of the framebuffer so every reduction step is at
most 2x2 (conservative); each mip stores the *minimum* depth (reverse-Z: the
farthest surface) of its footprint, and the occlusion test passes when the
sphere's nearest depth is greater than the sampled value.

The TPU layout is a dense mip atlas [L, PH, PW] (mip l valid in
[:PH>>l, :PW>>l]) so data-dependent mip selection in the cull kernels is a
single 3D gather instead of a switch over per-mip buffers.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math3d import image_mip_levels, previous_pow2


def pyramid_shape(width: int, height: int) -> tuple[int, int, int]:
    """(levels, PH, PW) for a framebuffer of size width x height."""
    pw = previous_pow2(width)
    ph = previous_pow2(height)
    return image_mip_levels(pw, ph), ph, pw


def _min_sample_reduce(src: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """One reduction step: out[y,x] = min of the 2x2 bilinear footprint of a
    min-reduction sampler at uv=((x,y)+0.5)/out_size (depthreduce.comp.glsl:19)."""
    in_h, in_w = src.shape

    if in_h == out_h * 2 and in_w == out_w * 2:
        # exact halving: the footprint is the aligned 2x2 block -> dense
        # reshape-min, no gather (the hot path: all mips of a pow2 pyramid)
        return src.reshape(out_h, 2, out_w, 2).min(axis=(1, 3))

    # non-pow2 step (only the base level of a non-pow2 framebuffer): take a
    # dense 3x3 shifted-min prefilter, then ONE nearest gather per texel.
    # f[y,x] = min(src[y:y+3, x:x+3]) covers the 2x2 bilinear footprint at
    # (y,x) as a superset, so the result is <= the sampler's value — strictly
    # conservative for the reverse-Z occlusion test (never over-culls).
    def shift_min(a, axis):
        def sh(b):
            head = [slice(None)] * b.ndim
            head[axis] = slice(1, None)
            tail = [slice(None)] * b.ndim
            tail[axis] = slice(-1, None)
            return jnp.concatenate([b[tuple(head)], b[tuple(tail)]], axis=axis)

        s1 = sh(a)
        return jnp.minimum(a, jnp.minimum(s1, sh(s1)))

    f = shift_min(shift_min(src, 0), 1)

    def sel_pattern(out_n, in_n):
        """Nearest-texel source index per output texel (the sampler's
        floor((i+0.5)*in/out - 0.5) mapping), exploited as a PERIODIC
        pattern: for g = gcd(out, in), index(i + (out/g)*k) =
        index(i) + (in/g)*k — so selection is (out/g) static slices over
        (in/g)-element groups instead of a per-texel gather (~12 ns/elem
        on this chip; the 1080p base level alone cost ~8 ms/frame).
        Selection only — values are bit-identical to the gather form."""
        import math

        g = math.gcd(out_n, in_n)
        q, p = out_n // g, in_n // g
        idx = [min(max(math.floor((j + 0.5) * in_n / out_n - 0.5), 0), p - 1)
               for j in range(q)]
        return g, q, p, idx

    # columns: [in_h, g*p] -> pick q static columns per p-group
    gx, qx, px, ix = sel_pattern(out_w, in_w)
    f2 = f.reshape(in_h, gx, px)
    cols = jnp.stack([f2[:, :, j] for j in ix], axis=-1).reshape(in_h, out_w)
    # rows: same pattern along y
    gy, qy, py, iy = sel_pattern(out_h, in_h)
    f3 = cols.reshape(gy, py, out_w)
    return jnp.stack([f3[:, j, :] for j in iy], axis=1).reshape(out_h, out_w)


def build_pyramid(depth: jnp.ndarray, levels: int, ph: int, pw: int) -> jnp.ndarray:
    """depth [H,W] -> atlas [levels, ph, pw] of min-reduced mips.

    The atlas stores *footprint-filtered* texels: entry (x, y) holds
    min(mip[y:y+2, x:x+2]) (clamped), so the occlusion test's min-reduction
    2x2 sample becomes a single gather (cullmath.sample_pyramid_min).
    Per-element gathers dominate cull cost on this TPU; the extra dense
    shifted-min here is nearly free."""
    mips = []
    src = depth
    h, w = ph, pw
    for lvl in range(levels):
        mip = _min_sample_reduce(src, h, w)
        # 2x2 footprint min with clamp-to-edge semantics
        right = jnp.concatenate([mip[:, 1:], mip[:, -1:]], axis=1)
        down = jnp.concatenate([mip[1:, :], mip[-1:, :]], axis=0)
        downright = jnp.concatenate([right[1:, :], right[-1:, :]], axis=0)
        filtered = jnp.minimum(jnp.minimum(mip, right), jnp.minimum(down, downright))
        mips.append(jnp.pad(filtered, ((0, ph - h), (0, pw - w))))
        src = mip
        h = max(h // 2, 1)
        w = max(w // 2, 1)
    return jnp.stack(mips, axis=0)
