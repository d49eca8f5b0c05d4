from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu.ops import raster, raster_tile
from test_raster import make_tc, raster_oracle, frag_of

WIDTH, HEIGHT = 128, 64  # one tile column, 8 tile rows
TILES_X = WIDTH // raster_tile.TILE_W
TILES_Y = HEIGHT // raster_tile.TILE_H

setup_j = jax.jit(lambda tc: raster.compact_setup(tc, WIDTH, HEIGHT, 0.1, 1024))


def run_tile_raster(screen_tris, pair_capacity=1 << 12):
    tc = make_tc(screen_tris, WIDTH, HEIGHT)
    st = setup_j(tc)
    n_tiles = TILES_X * TILES_Y
    depth_t = jnp.zeros((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
    vis_t = jnp.full((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), raster.INVALID_FRAG, jnp.int32)
    depth_t, vis_t, stats = raster_tile.rasterize_tiles(
        st, depth_t, vis_t, tiles_x=TILES_X, tiles_y=TILES_Y,
        pair_capacity=pair_capacity, interpret=True,
    )
    depth = np.asarray(raster_tile.tiles_to_image(depth_t, HEIGHT, WIDTH))
    vis = np.asarray(raster_tile.tiles_to_image(vis_t, HEIGHT, WIDTH))
    return depth, vis, stats


def test_tiles_roundtrip(rng):
    img = rng.normal(size=(HEIGHT, WIDTH)).astype(np.float32)
    tiles = raster_tile.image_to_tiles(jnp.array(img), HEIGHT, WIDTH)
    assert tiles.shape == (TILES_X * TILES_Y, raster_tile.TILE_H, raster_tile.TILE_W)
    back = np.asarray(raster_tile.tiles_to_image(tiles, HEIGHT, WIDTH))
    np.testing.assert_array_equal(back, img)
    # tile 0 is the top-left block, stored band-major: element
    # [b, y*BAND_W + xb] = img[y, b*BAND_W + xb]
    blk = img[:8, :128].reshape(8, raster_tile.NBANDS, raster_tile.BAND_W)
    np.testing.assert_array_equal(
        np.asarray(tiles[0]),
        np.transpose(blk, (1, 0, 2)).reshape(8, 128),
    )


def test_single_triangle_matches_oracle():
    tris = [[(10.0, 10.0, 0.5, 1.0), (60.0, 12.0, 0.5, 1.0), (20.0, 50.0, 0.5, 1.0)]]
    depth, vis, _ = run_tile_raster(tris)
    odepth, ovis = raster_oracle(tris, WIDTH, HEIGHT)
    np.testing.assert_allclose(depth, odepth, atol=2e-5)
    assert ((vis != raster.INVALID_FRAG) == (ovis != raster.INVALID_FRAG)).all()
    assert (vis != raster.INVALID_FRAG).sum() > 200


def test_matches_scatter_rasterizer(rng):
    """Tile kernel and scatter-merge rasterizer must resolve identically."""
    tris = []
    for _ in range(40):
        x, y = rng.uniform(2, 100, size=1)[0], rng.uniform(2, 50, size=1)[0]
        z = rng.uniform(0.1, 0.9)
        tris.append(
            [
                (x, y, z, 1.0),
                (x + rng.uniform(1, 12), y + rng.uniform(-2, 2), z, 1.0),
                (x + rng.uniform(-2, 2), y + rng.uniform(1, 12), z, 1.0),
            ]
        )
    depth_t, vis_t, _ = run_tile_raster(tris)

    tc = make_tc(tris, WIDTH, HEIGHT)
    st = setup_j(tc)
    fb = raster.rasterize(st, WIDTH, HEIGHT, small_capacity=4096, big_capacity=64)
    depth_s, vis_s = np.asarray(fb.depth), np.asarray(fb.vis)

    np.testing.assert_array_equal(depth_t, depth_s)
    np.testing.assert_array_equal(vis_t, vis_s)


def test_depth_and_tie_rules():
    far = [(5.0, 5.0, 0.3, 1.0), (100.0, 5.0, 0.3, 1.0), (5.0, 50.0, 0.3, 1.0)]
    near = [(5.0, 5.0, 0.7, 1.0), (100.0, 5.0, 0.7, 1.0), (5.0, 50.0, 0.7, 1.0)]
    dup = list(near)
    depth, vis, _ = run_tile_raster([far, near, dup])
    inside = vis != raster.INVALID_FRAG
    assert inside.any()
    # near triangle wins; among the two identical near triangles the lower
    # fragment id (emission order) wins
    assert (vis[inside] == frag_of(1)).all()
    np.testing.assert_allclose(depth[inside], 0.7)


def test_big_triangle_spans_many_tiles():
    tri = [(2.0, 2.0, 0.5, 1.0), (120.0, 4.0, 0.5, 1.0), (3.0, 60.0, 0.5, 1.0)]
    depth, vis, stats = run_tile_raster([tri])
    odepth, _ = raster_oracle([tri], WIDTH, HEIGHT)
    np.testing.assert_allclose(depth, odepth, atol=2e-5)
    assert int(stats["huge_dropped"]) == 0
    # spans > SMALL_TY tile rows -> must have used the mid path
    assert int(stats["pair_count"]) >= 7


def test_pair_overflow_drops():
    tris = []
    for i in range(30):
        x = 2.0 + i * 4
        tris.append([(x, 2.0, 0.5, 1.0), (x + 3, 2.0, 0.5, 1.0), (x, 6.0, 0.5, 1.0)])
    depth, vis, stats = run_tile_raster(tris, pair_capacity=8)
    kept = np.unique(vis[vis != raster.INVALID_FRAG])
    assert 0 < len(kept) <= 8


def test_tiny2_class_overflow_is_counted():
    """Two-tile triangles go through the tiny2 compactor (emit_pairs) at
    T//2 capacity; overflow must drop whole triangles AND be counted —
    never vanish silently (the drop-observability contract every capacity
    in the pipeline follows)."""
    # 700 small triangles each crossing one horizontal tile boundary
    # (ty spans 2, tx spans 1) -> tiny2 class; setup capacity is 1024 so
    # the tiny2 compactor holds max(1024//2, 256) = 512 of them
    tris = []
    for i in range(700):
        x = 2.0 + (i % 120) * 1.0
        y = 6.0 + (i // 120) * 8.0
        tris.append([(x, y, 0.5, 1.0), (x + 1.5, y, 0.5, 1.0), (x, y + 3.0, 0.5, 1.0)])
    depth, vis, stats = run_tile_raster(tris)
    assert int(stats["huge_dropped"]) == 700 - 512
    kept = np.unique(vis[vis != raster.INVALID_FRAG])
    assert len(kept) <= 512
    assert len(kept) > 256  # the survivors actually rendered (overlapping
    # columns resolve ties to the smaller id, so not every survivor wins
    # a pixel)
