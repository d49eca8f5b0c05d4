"""Bloom: CoD-style downsample/upsample mip chain.

Reference: bloom.comp.glsl (3 phases driven by niagara.cpp:1866-1904):
  phase 0: extract emissive-weighted color from the G-buffer to half res;
  phase 1: 13-tap Jimenez downsample per mip;
  phase 2: 9-tap tent upsample accumulating up the chain.
The composite applies `bloom * 0.1` (final.comp.glsl:76).

TPU formulation: on this hardware irregular gathers cost ~the same as
scatters, so the bilinear tap patterns are expanded into *exact* fixed
stencils (each half-texel bilinear tap is a 2x2 average) and evaluated with
padded shifted slices — fully dense VPU work, zero gathers.  Odd mip sizes
are edge-padded to even before each 2:1 step, which reproduces the sampler's
clamp-to-edge behavior.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.math3d import image_mip_levels
from . import cullmath

# 13-tap Jimenez downsample: (dx, dy, weight) at half-texel bilinear positions
_DOWN_TAPS = (
    [(0, 0, 0.125)]
    + [(dx, dy, 0.03125) for dx in (-2, 2) for dy in (-2, 2)]
    + [(0, -2, 0.0625), (0, 2, 0.0625), (-2, 0, 0.0625), (2, 0, 0.0625)]
    + [(dx, dy, 0.125) for dx in (-1, 1) for dy in (-1, 1)]
)

# 9-tap tent upsample
_UP_TAPS = (
    [(0, 0, 0.25)]
    + [(d, 0, 0.125) for d in (-1, 1)]
    + [(0, d, 0.125) for d in (-1, 1)]
    + [(dx, dy, 0.0625) for dx in (-1, 1) for dy in (-1, 1)]
)


def _down_kernel():
    """Expand the 13 bilinear taps into a 6x6 source-texel stencil for exact
    2:1 downsampling (output texel (x,y) reads source (2x+i, 2y+j))."""
    k = np.zeros((6, 6), np.float64)  # offsets i,j in [-2, 3] -> index i+2
    for dx, dy, w in _DOWN_TAPS:
        # tap at source coord (2x+1+dx, 2y+1+dy) - 0.5 => floor 2x+dx, frac .5
        for i in (dx, dx + 1):
            for j in (dy, dy + 1):
                k[j + 2, i + 2] += w * 0.25
    return k


def _up_kernels():
    """Phase kernels for exact 1:2 tent upsampling.  Output (x,y) with
    parity (px,py) reads source texels around x//2."""
    ks = {}
    for px in (0, 1):
        for py in (0, 1):
            k = np.zeros((5, 5), np.float64)  # offsets in [-2, 2] -> index+2
            for dx, dy, w in _UP_TAPS:
                # source coord s = (x+0.5)/2 + d - 0.5; x = 2k+p
                # => s = k + d + (p - 1)/2 + 0.25 ... compute fractional split
                sx = (px + 0.5) / 2.0 + dx - 0.5
                sy = (py + 0.5) / 2.0 + dy - 0.5
                x0, fx = int(np.floor(sx)), sx - np.floor(sx)
                y0, fy = int(np.floor(sy)), sy - np.floor(sy)
                for i, wx in ((x0, 1 - fx), (x0 + 1, fx)):
                    for j, wy in ((y0, 1 - fy), (y0 + 1, fy)):
                        k[j + 2, i + 2] += w * wx * wy
            ks[(py, px)] = k
    return ks


_DOWN_K = _down_kernel()
_UP_K = _up_kernels()


def bloom_levels(width: int, height: int) -> int:
    bw, bh = (width + 1) // 2, (height + 1) // 2
    return min(8, image_mip_levels(bw, bh))


# All internals work channel-first [3, H, W]: a trailing 3-channel axis
# would occupy only 3 of 128 VPU lanes; channel-first keeps the image width
# on the lane dimension.


def _pad_even(img):
    h, w = img.shape[1:]
    return jnp.pad(img, ((0, 0), (0, h % 2), (0, w % 2)), mode="edge")


def _down2(src):
    """Exact 13-tap downsample by 2 (stencil form), [C,h,w] -> [C,h/2,w/2].

    Strided (::2) slices cost ~6x a dense slice on TPU (cross-lane
    shuffles), so the padded source is de-interleaved ONCE into 2x2 parity
    planes and every stencil tap becomes a dense shifted slice of a plane."""
    src = _pad_even(src)
    h, w = src.shape[1:]
    oh, ow = h // 2, w // 2
    p = jnp.pad(src, ((0, 0), (2, 4), (2, 4)), mode="edge")
    c, ph2, pw2 = p.shape
    planes = p.reshape(c, ph2 // 2, 2, pw2 // 2, 2)
    plane = [[planes[:, :, a, :, b] for b in (0, 1)] for a in (0, 1)]
    out = jnp.zeros((c, oh, ow), src.dtype)
    for j in range(6):
        for i in range(6):
            wgt = _DOWN_K[j, i]
            if wgt == 0.0:
                continue
            sp = plane[j % 2][i % 2]
            out = out + wgt * sp[:, j // 2 : j // 2 + oh, i // 2 : i // 2 + ow]
    return out


def _up2(src, oh, ow):
    """Exact 9-tap tent upsample to (oh, ow) (stencil phase form), [C,h,w]."""
    h, w = src.shape[1:]
    p = jnp.pad(src, ((0, 0), (2, 2), (2, 2)), mode="edge")
    phases = {}
    for (py, px), k in _UP_K.items():
        acc = 0.0
        for j in range(5):
            for i in range(5):
                wgt = k[j, i]
                if wgt == 0.0:
                    continue
                acc = acc + wgt * p[:, j : j + h, i : i + w]
        phases[(py, px)] = acc
    return _interleave_phases(phases, h, w)[:, :oh, :ow]


def _interleave_phases(phases, h, w):
    """Assemble out[:, 2y+py, 2x+px] = phases[(py,px)][:, y, x] with dense
    stack+reshape (strided `.at[::2]` writes lower to scatters on TPU, which
    cost ~20ms at 1080p; this is a free layout shuffle instead)."""
    c = phases[(0, 0)].shape[0]
    rows = [
        jnp.stack([phases[(py, 0)], phases[(py, 1)]], axis=-1).reshape(c, h, w * 2)
        for py in (0, 1)
    ]
    return jnp.stack(rows, axis=2).reshape(c, h * 2, w * 2)


def extract_emissive(g0, width, height):
    """Phase 0: decode emissive from the G-buffer at half resolution
    (bloom.comp.glsl pass 0).  Returns [3, bh, bw]."""
    albedo = cullmath.from_srgb(g0[..., :3])
    emissive = jnp.moveaxis(albedo * (jnp.exp2(g0[..., 3] * 5.0) - 1.0)[..., None], -1, 0)
    e = _pad_even(emissive)
    c, h, w = e.shape
    # box 2x2 (the reference's bilinear fetch at half res is an exact 2x2
    # avg); reshape-reduce instead of strided slices (lane-shuffle cost)
    return 0.25 * e.reshape(c, h // 2, 2, w // 2, 2).sum(axis=(2, 4))


def compute_bloom(g0, width: int, height: int):
    """Full bloom chain; returns the half-res bloom image [3,bh,bw]."""
    levels = bloom_levels(width, height)
    mips = [extract_emissive(g0, width, height)]
    for _ in range(1, levels):
        mips.append(_down2(mips[-1]))

    acc = mips[-1]
    for i in range(levels - 2, -1, -1):
        oh, ow = mips[i].shape[1:]
        acc = mips[i] + _up2(acc, oh, ow)
    return acc


def sample_bloom_fullres(bloom_half, width: int, height: int):
    """Bilinear expansion of the half-res bloom to full resolution [H,W,3]
    (the composite samples it with a linear sampler, final.comp.glsl:76)."""
    return jnp.moveaxis(_bilinear_x2(bloom_half, height, width), 0, -1)


def _bilinear_x2(src, oh, ow):
    """Exact 1:2 bilinear upsample (phase weights 0.25/0.75), [C,h,w]."""
    h, w = src.shape[1:]
    p = jnp.pad(src, ((0, 0), (1, 1), (1, 1)), mode="edge")
    phases = {}
    for py in (0, 1):
        for px in (0, 1):
            # output (2k+p): source coord k + (p+0.5)/2 - 0.5 -> offsets
            sx = (px + 0.5) / 2.0 - 0.5
            sy = (py + 0.5) / 2.0 - 0.5
            x0, fx = int(np.floor(sx)), sx - np.floor(sx)
            y0, fy = int(np.floor(sy)), sy - np.floor(sy)
            v = 0.0
            for i, wx in ((x0, 1 - fx), (x0 + 1, fx)):
                for j, wy in ((y0, 1 - fy), (y0 + 1, fy)):
                    v = v + wx * wy * p[:, 1 + j : 1 + j + h, 1 + i : 1 + i + w]
            phases[(py, px)] = v
    return _interleave_phases(phases, h, w)[:, :oh, :ow]
