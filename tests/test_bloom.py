import numpy as np
import pytest

import jax.numpy as jnp

from niagara_tpu.ops import bloom


def bilinear(img, x, y):
    """Clamp-to-edge bilinear fetch at texel coords (x - 0.5 origin)."""
    h, w = img.shape[:2]
    x = x - 0.5
    y = y - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0

    def at(yy, xx):
        return img[min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)]

    top = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
    bot = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def down_oracle(src, oh, ow):
    sh, sw = src.shape[:2]
    out = np.zeros((oh, ow, src.shape[2]), np.float32)
    for y in range(oh):
        for x in range(ow):
            u = (x + 0.5) / ow * sw
            v = (y + 0.5) / oh * sh
            s = 0
            taps = bloom._DOWN_TAPS
            for dx, dy, wgt in taps:
                s = s + wgt * bilinear(src, u + dx, v + dy)
            out[y, x] = s
    return out


def up_oracle(src, oh, ow):
    sh, sw = src.shape[:2]
    out = np.zeros((oh, ow, src.shape[2]), np.float32)
    for y in range(oh):
        for x in range(ow):
            u = (x + 0.5) / ow * sw
            v = (y + 0.5) / oh * sh
            s = 0
            for dx, dy, wgt in bloom._UP_TAPS:
                s = s + wgt * bilinear(src, u + dx, v + dy)
            out[y, x] = s
    return out


def test_down2_matches_bilinear_oracle(rng):
    src = rng.uniform(size=(16, 24, 3)).astype(np.float32)
    got = np.moveaxis(np.asarray(bloom._down2(jnp.moveaxis(jnp.array(src), -1, 0))), 0, -1)
    want = down_oracle(src, 8, 12)
    # interior texels exact; borders differ only by clamp handling
    np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1], atol=1e-5)


def test_up2_matches_bilinear_oracle(rng):
    src = rng.uniform(size=(8, 12, 3)).astype(np.float32)
    got = np.moveaxis(np.asarray(bloom._up2(jnp.moveaxis(jnp.array(src), -1, 0), 16, 24)), 0, -1)
    want = up_oracle(src, 16, 24)
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=1e-5)


def test_bilinear_x2(rng):
    src = rng.uniform(size=(6, 6, 3)).astype(np.float32)
    got = np.moveaxis(np.asarray(bloom._bilinear_x2(jnp.moveaxis(jnp.array(src), -1, 0), 12, 12)), 0, -1)
    for y in range(2, 10):
        for x in range(2, 10):
            u = (x + 0.5) / 12 * 6
            v = (y + 0.5) / 12 * 6
            np.testing.assert_allclose(got[y, x], bilinear(src, u, v), atol=1e-5)


def test_bloom_chain_energy(rng):
    """A single bright emissive spot blooms into a smooth blob; total bloom
    energy stays bounded and positive."""
    H = W = 128
    g0 = np.zeros((H, W, 4), np.float32)
    g0[..., :3] = 0.5
    g0[64, 64, 3] = 1.0  # strong emissive at one pixel
    out = np.moveaxis(np.asarray(bloom.compute_bloom(jnp.array(g0), W, H)), 0, -1)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()
    assert out.max() > 0
    # spread: neighbors of the hotspot are lit
    assert out[33, 33].sum() > 0
    assert out[5, 5].sum() < out[32, 32].sum()
