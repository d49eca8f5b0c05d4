"""Bloom: CoD-style downsample/upsample mip chain.

Reference: bloom.comp.glsl (3 phases driven by niagara.cpp:1866-1904):
  phase 0: extract emissive-weighted color from the G-buffer to half res;
  phase 1: 13-tap Jimenez downsample per mip;
  phase 2: 9-tap tent upsample accumulating up the chain (0.5 blend).
The composite applies `bloom * 0.1` (final.comp.glsl:76).

TPU formulation: each tap pattern is a fixed small stencil -> implemented as
gather-free shifted adds on dense images (XLA fuses the whole pyramid into a
few kernels).  Mips are kept as a list of static-shape arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math3d import image_mip_levels
from . import cullmath


def bloom_levels(width: int, height: int) -> int:
    bw, bh = (width + 1) // 2, (height + 1) // 2
    return min(8, image_mip_levels(bw, bh))


def _sample_bilinear(img, u, v):
    """Bilinear sample of img [H,W,3] at texel-space coords (u,v) arrays."""
    h, w = img.shape[:2]
    x = u - 0.5
    y = v - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def at(yi, xi):
        return img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]

    top = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
    bot = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _grid(out_h, out_w, src_h, src_w):
    """Texel coords in the source image for each output pixel center."""
    u = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w * src_w
    v = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h * src_h
    return jnp.meshgrid(u, v)


def extract_emissive(g0, width, height):
    """Phase 0: decode emissive from the G-buffer at half resolution
    (bloom.comp.glsl pass 0: albedo * (exp2(a*5)-1))."""
    albedo = cullmath.from_srgb(g0[..., :3])
    emissive = albedo * (jnp.exp2(g0[..., 3] * 5.0) - 1.0)[..., None]
    bw, bh = (width + 1) // 2, (height + 1) // 2
    u, v = _grid(bh, bw, height, width)
    # note: u,v meshgrid ordering: u is x coord
    return _sample_bilinear(emissive, u, v)


def _downsample13(src, out_h, out_w):
    """Jimenez 13-tap partial Karis average downsample."""
    sh, sw = src.shape[:2]
    u, v = _grid(out_h, out_w, sh, sw)

    def s(dx, dy):
        return _sample_bilinear(src, u + dx, v + dy)

    center = s(0, 0) * 0.125
    corners = (s(-2, -2) + s(2, -2) + s(-2, 2) + s(2, 2)) * 0.03125
    edges = (s(0, -2) + s(-2, 0) + s(2, 0) + s(0, 2)) * 0.0625
    inner = (s(-1, -1) + s(1, -1) + s(-1, 1) + s(1, 1)) * 0.125
    return center + corners + edges + inner


def _upsample_tent(src, out_h, out_w):
    """9-tap tent filter upsample."""
    sh, sw = src.shape[:2]
    u, v = _grid(out_h, out_w, sh, sw)

    def s(dx, dy):
        return _sample_bilinear(src, u + dx, v + dy)

    return (
        s(0, 0) * 0.25
        + (s(-1, 0) + s(1, 0) + s(0, -1) + s(0, 1)) * 0.125
        + (s(-1, -1) + s(1, -1) + s(-1, 1) + s(1, 1)) * 0.0625
    )


def compute_bloom(g0, width: int, height: int):
    """Full bloom chain; returns the half-res bloom image [bh,bw,3] that the
    composite upsamples (bilinearly) and adds with strength 0.1."""
    levels = bloom_levels(width, height)
    mips = [extract_emissive(g0, width, height)]
    h, w = mips[0].shape[:2]
    for _ in range(1, levels):
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        mips.append(_downsample13(mips[-1], h2, w2))
        h, w = h2, w2

    # accumulate upward: mip[i] = mip[i] + tent_upsample(mip[i+1])
    acc = mips[-1]
    for i in range(levels - 2, -1, -1):
        oh, ow = mips[i].shape[:2]
        acc = mips[i] + _upsample_tent(acc, oh, ow)
    return acc


def sample_bloom_fullres(bloom_half, width: int, height: int):
    """Bilinear expansion of the half-res bloom to full resolution (the
    composite samples it with a linear sampler, final.comp.glsl:76)."""
    bh, bw = bloom_half.shape[:2]
    u, v = _grid(height, width, bh, bw)
    return _sample_bilinear(bloom_half, u, v)
