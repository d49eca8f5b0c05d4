"""Measured divergence of the baked 8x8 opacity masks vs full-res alpha.

The reference alpha-tests per fragment against the albedo texture
(mesh.frag.glsl:88-89 `discard` at alpha < 0.5); this design bakes an 8x8
uv-AABB bitmask per triangle (cooker/opacity.py) and gates coverage with
two multiplies at raster time.  That trade is quantization: a triangle
spanning a large uv range gets 64 cells total.  This test MEASURES the
divergence on a realistic foliage cutout — thin stems, leaf blobs — in the
two regimes that bracket real content:

  * "card": one quad (2 triangles) spanning the whole texture — the worst
    case (each cell covers 32x32 texels of a 256^2 texture);
  * "grid": the same texture on an 8x8-quad mesh — the typical authored
    foliage density (each triangle's AABB covers ~32^2 texels -> cells of
    ~4x4 texels).

Decision replication: gx/gy/bit-extract below mirror ops/raster_tile.py's
alpha branch arithmetic exactly (floor((u - u0) * 8/du) clipped to 0..7).

Conservativeness: the bake samples at >= 2x texel rate (adaptive density,
cooker/opacity.py), so a cell is transparent ONLY if every texel in it is
— false DISCARDS (oracle keeps, mask drops) are structurally zero: the
mask never deletes real geometry (the HW-OMM "anything non-transparent is
opaque/unknown" convention, reference scene.cpp buildSceneOmm).  False
KEEPS (oracle drops, mask keeps) are the 8x8 quantization cost and shrink
with triangle density.  Measured on this texture (asserted with headroom):

  card:  false-discard 0.000, false-keep 0.499 of all samples (worst case:
         each cell covers 32x32 texels, any stem texel fills it)
  grid:  false-discard 0.000, false-keep 0.067
"""

import numpy as np
import pytest

from niagara_tpu.cooker import opacity


def make_foliage_alpha(size=256, seed=7):
    """Leaf blobs + 1-2 texel stems on transparent background (RGBA u8)."""
    rng = np.random.default_rng(seed)
    a = np.zeros((size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    for _ in range(12):  # elliptical leaves
        cx, cy = rng.uniform(0.1, 0.9, 2) * size
        rx, ry = rng.uniform(0.04, 0.12, 2) * size
        th = rng.uniform(0, np.pi)
        dx, dy = xx - cx, yy - cy
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        a[(u / rx) ** 2 + (v / ry) ** 2 <= 1.0] = 1.0

    for _ in range(10):  # thin stems: 1-2 texel wide segments
        x0, y0 = rng.uniform(0.05, 0.95, 2) * size
        ang = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(0.2, 0.5) * size
        t = np.linspace(0, 1, int(ln * 2))
        xs = np.clip(x0 + np.cos(ang) * ln * t, 0, size - 1).astype(int)
        ys = np.clip(y0 + np.sin(ang) * ln * t, 0, size - 1).astype(int)
        a[ys, xs] = 1.0
        a[np.minimum(ys + 1, size - 1), xs] = 1.0

    img = np.zeros((size, size, 4), np.uint8)
    img[..., 3] = (a * 255).astype(np.uint8)
    return img


def quad_mesh(n):
    """n x n grid of quads over uv [0,1]^2 -> (uv [V,2], tris [T,3])."""
    g = np.linspace(0.0, 1.0, n + 1)
    uu, vv = np.meshgrid(g, g)
    uv = np.stack([uu.reshape(-1), vv.reshape(-1)], axis=1)
    tris = []
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i
            b, c, d = a + 1, a + n + 2, a + n + 1
            tris += [[a, b, c], [a, c, d]]
    return uv.astype(np.float32), np.asarray(tris, np.int32)


def mask_decision(rows, u, v):
    """Render-time gate, numpy transcription of ops/raster_tile.py's alpha
    branch (gx/gy clip + 16-bit-half bit extract)."""
    u0, v0, idu, idv = rows[4], rows[5], rows[6], rows[7]
    if idu <= 0.0:
        return np.ones_like(u, bool)
    gx = np.clip(np.floor((u - u0) * idu), 0.0, 7.0)
    gy = np.clip(np.floor((v - v0) * idv), 0.0, 7.0)
    b = gy * 8.0 + gx
    half = np.choose((b // 16).astype(int), rows[0:4])
    t = np.floor(half * np.exp2(-np.mod(b, 16.0)))
    return (t - 2.0 * np.floor(t * 0.5)) > 0.5


def measure(img, grid_n, samples=384):
    uv, tris = quad_mesh(grid_n)
    rows = opacity.bake_mesh_masks(uv, tris, img)

    # dense uv sample grid; assign each sample to its containing triangle
    g = (np.arange(samples) + 0.5) / samples
    su, sv = np.meshgrid(g, g)
    su, sv = su.reshape(-1), sv.reshape(-1)
    cell_i = np.minimum((su * grid_n).astype(int), grid_n - 1)
    cell_j = np.minimum((sv * grid_n).astype(int), grid_n - 1)
    fu, fv = su * grid_n - cell_i, sv * grid_n - cell_j
    tri = (cell_j * grid_n + cell_i) * 2 + (fu + fv > 1.0).astype(int)

    oracle = opacity._sample_alpha(img, su, sv) >= 0.5
    got = np.zeros_like(oracle)
    for t in np.unique(tri):
        m = tri == t
        got[m] = mask_decision(rows[t], su[m], sv[m])

    n = len(su)
    false_keep = np.sum(got & ~oracle) / n
    false_discard = np.sum(~got & oracle) / n
    return false_keep, false_discard


def test_card_worst_case_divergence():
    img = make_foliage_alpha()
    fk, fd = measure(img, grid_n=1)
    # adaptive >= 2x-texel-rate bake: the mask NEVER drops a truly-opaque
    # sample (no silhouette loss, ever)
    assert fd == 0.0, f"false discards {fd:.5f} — mask dropped real pixels"
    # 64 cells over the whole texture: any stem texel fills its 32x32-texel
    # cell.  Measured 0.499 on this texture; bound with headroom.
    assert fk < 0.6, f"card false-keep {fk:.3f} out of expected range"


def test_grid_divergence_shrinks_with_density():
    img = make_foliage_alpha()
    fk_card, _ = measure(img, grid_n=1)
    fk_grid, fd_grid = measure(img, grid_n=8)
    assert fd_grid == 0.0
    # typical authored density: divergence must drop well below the card
    assert fk_grid < fk_card / 2.5
    assert fk_grid < 0.09, f"grid false-keep {fk_grid:.3f} too high"


def test_fully_opaque_region_exact():
    # a solid texture must bake to all-opaque masks: zero divergence
    img = np.zeros((64, 64, 4), np.uint8)
    img[..., 3] = 255
    fk, fd = measure(img, grid_n=2, samples=128)
    assert fk == 0.0 and fd == 0.0
