from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu.config import MESH_MAXTRI, MESH_MAXVTX
from niagara_tpu.ops import raster

rasterize_j = partial(
    jax.jit, static_argnames=("width", "height", "small_capacity", "big_capacity", "frag_offset")
)(raster.rasterize)
setup_j = partial(jax.jit, static_argnames=("width", "height", "znear", "capacity"))(raster.compact_setup)
SETUP_CAP = 1024


TRIS_PER_CLUSTER = MESH_MAXVTX // 3  # 21 unshared-corner triangles per cluster


def make_tc(screen_tris, width, height):
    """Build a minimal cluster-transform dict holding the given screen-space
    triangles (list of 3x(x, y, zndc, viewz)), chunked across clusters.

    NOTE: fragment ids are cluster*MESH_MAXTRI + tri, so with chunking the
    oracle's triangle index t maps to fragment id
    (t // TRIS_PER_CLUSTER) * MESH_MAXTRI + t % TRIS_PER_CLUSTER."""
    n = len(screen_tris)
    K = (n + TRIS_PER_CLUSTER - 1) // TRIS_PER_CLUSTER
    sx = np.zeros((K, MESH_MAXVTX), dtype=np.float32)
    sy = np.zeros((K, MESH_MAXVTX), dtype=np.float32)
    zw = np.zeros((K, MESH_MAXVTX), dtype=np.float32)
    viewz = np.full((K, MESH_MAXVTX), 1.0, dtype=np.float32)
    tri = np.zeros((K, MESH_MAXTRI, 3), dtype=np.int32)
    tri_valid = np.zeros((K, MESH_MAXTRI), dtype=bool)
    for t, corners in enumerate(screen_tris):
        k = t // TRIS_PER_CLUSTER
        tl = t % TRIS_PER_CLUSTER
        # tests author triangles CCW in y-down screen coords (the OLD front
        # convention); world-CCW front-facing means CW on a y-down screen,
        # so reverse each triangle's order here
        corners = [corners[0], corners[2], corners[1]]
        for c, (x, y, zndc, vz) in enumerate(corners):
            i = tl * 3 + c
            sx[k, i], sy[k, i], zw[k, i], viewz[k, i] = x, y, zndc, vz
            tri[k, tl, c] = i
        tri_valid[k, tl] = True
    return dict(
        tri_valid=jnp.array(tri_valid),
        vid=jnp.zeros((K, MESH_MAXVTX), dtype=jnp.int32),
        # homogeneous pixel coords (hx/w = screen x); tests use w=viewz
        hx=jnp.array(sx * viewz),
        hy=jnp.array(sy * viewz),
        zw=jnp.array(zw),
        viewz=jnp.array(viewz),
        tri=jnp.array(tri),
        draw_id=jnp.zeros(K, dtype=jnp.int32),
        mi=jnp.zeros(K, dtype=jnp.int32),
    )


def tri_is_valid(corners, width, height):
    """Replicates compact_setup's validity test for the oracle id mapping."""
    (ax, ay, _, _), (bx, by, _, _), (cx, cy, _, _) = corners
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if area <= 0:
        return False
    x0 = max(min(int(np.floor(min(ax, bx, cx))), width - 1), 0)
    y0 = max(min(int(np.floor(min(ay, by, cy))), height - 1), 0)
    x1 = max(min(int(np.ceil(max(ax, bx, cx))), width), 0)
    y1 = max(min(int(np.ceil(max(ay, by, cy))), height), 0)
    return x1 > x0 and y1 > y0


def frag_map(screen_tris, width=64, height=64):
    """Oracle triangle index -> compacted fragment id (or None if culled)."""
    out = {}
    slot = 0
    for t, corners in enumerate(screen_tris):
        if tri_is_valid(corners, width, height):
            out[t] = slot
            slot += 1
    return out


def frag_of(t, screen_tris=None, width=64, height=64):
    if screen_tris is None:
        return t  # all-valid sequential emission -> identity mapping
    return frag_map(screen_tris, width, height).get(t)


def raster_oracle(screen_tris, width, height):
    """Independent numpy scanline oracle: same pixel-center convention,
    top-left fill rule, reverse-Z max, min-fragid tie-break."""
    depth = np.zeros((height, width), dtype=np.float32)
    vis = np.full((height, width), raster.INVALID_FRAG, dtype=np.int64)
    ys, xs = np.mgrid[0:height, 0:width]
    fx, fy = xs + 0.5, ys + 0.5
    for t, corners in enumerate(screen_tris):
        (ax, ay, az, _), (bx, by, bz, _), (cx, cy, cz, _) = corners
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if area <= 0:
            continue

        def edge_cov(px, py, qx, qy):
            # edge P->Q, interior-positive; top-left rule accepts e == 0
            # when the interior is right of the edge (a > 0) or below a
            # horizontal edge (a == 0, b > 0) — same rule as the kernels
            a, b = py - qy, qx - px
            e = (qx - px) * (fy - py) - (qy - py) * (fx - px)
            return (e > 0) | ((e == 0) & ((a > 0) | ((a == 0) & (b > 0))))

        e0 = (bx - ax) * (fy - ay) - (by - ay) * (fx - ax)
        e1 = (cx - bx) * (fy - by) - (cy - by) * (fx - bx)
        e2 = (ax - cx) * (fy - cy) - (ay - cy) * (fx - cx)
        cover = edge_cov(ax, ay, bx, by) & edge_cov(bx, by, cx, cy) & edge_cov(cx, cy, ax, ay)
        b0, b1, b2 = e1 / area, e2 / area, e0 / area
        z = b0 * az + b1 * bz + b2 * cz
        cover &= (z > 0) & (z <= 1)
        better = cover & (z > depth)
        tie = cover & (z == depth) & (t < vis)
        depth = np.where(better, z, depth)
        vis = np.where(better, t, np.where(tie, t, vis))
    return depth, vis


def run_raster(screen_tris, width=64, height=64, small_capacity=256, big_capacity=32):
    tc = make_tc(screen_tris, width, height)
    st = setup_j(tc, width, height, 0.1, SETUP_CAP)
    fb = rasterize_j(st, width, height, small_capacity=small_capacity, big_capacity=big_capacity)
    return np.asarray(fb.depth), np.asarray(fb.vis)


def test_single_triangle_coverage_matches_oracle():
    tris = [[(10.0, 10.0, 0.5, 1.0), (40.0, 12.0, 0.5, 1.0), (20.0, 45.0, 0.5, 1.0)]]
    depth, vis = run_raster(tris)
    odepth, ovis = raster_oracle(tris, 64, 64)
    np.testing.assert_allclose(depth, odepth, atol=2e-5)
    assert ((vis != raster.INVALID_FRAG) == (ovis != raster.INVALID_FRAG)).all()
    assert (vis != raster.INVALID_FRAG).sum() > 100  # sanity: triangle covered pixels


def test_backface_is_culled():
    # clockwise winding (negative area) -> culled
    tris = [[(10.0, 10.0, 0.5, 1.0), (20.0, 45.0, 0.5, 1.0), (40.0, 12.0, 0.5, 1.0)]]
    depth, vis = run_raster(tris)
    assert (vis == raster.INVALID_FRAG).all()
    assert (depth == 0).all()


def test_depth_ordering_reverse_z():
    # two overlapping triangles; higher z (nearer in reverse-Z) must win
    far_tri = [(5.0, 5.0, 0.3, 1.0), (60.0, 5.0, 0.3, 1.0), (5.0, 60.0, 0.3, 1.0)]
    near_tri = [(5.0, 5.0, 0.7, 1.0), (60.0, 5.0, 0.7, 1.0), (5.0, 60.0, 0.7, 1.0)]
    depth, vis = run_raster([far_tri, near_tri])
    inside = vis != raster.INVALID_FRAG
    assert inside.any()
    # all covered pixels resolve to the near triangle (fragment id 1)
    assert (vis[inside] == 1).all()
    np.testing.assert_allclose(depth[inside], 0.7)


def test_equal_depth_tie_breaks_to_lower_fragment_id():
    tri = [(5.0, 5.0, 0.5, 1.0), (60.0, 5.0, 0.5, 1.0), (5.0, 60.0, 0.5, 1.0)]
    depth, vis = run_raster([tri, list(tri)])
    inside = vis != raster.INVALID_FRAG
    assert inside.any()
    assert (vis[inside] == 0).all()


def test_many_small_triangles_match_oracle(rng):
    tris = []
    for _ in range(30):
        x, y = rng.uniform(2, 55, size=2)
        z = rng.uniform(0.1, 0.9)
        # CCW (y-down): make second vertex to the right, third below
        tris.append(
            [
                (x, y, z, 1.0),
                (x + rng.uniform(1, 6), y + rng.uniform(-1, 1), z, 1.0),
                (x + rng.uniform(-1, 1), y + rng.uniform(1, 6), z, 1.0),
            ]
        )
    # keep only CCW ones for the oracle comparison (backface culled anyway)
    depth, vis = run_raster(tris)
    odepth, ovis = raster_oracle(tris, 64, 64)
    np.testing.assert_allclose(depth, odepth, atol=2e-5)
    inside = ovis != raster.INVALID_FRAG
    assert ((vis != raster.INVALID_FRAG) == inside).all()
    # fragment ids agree almost everywhere (tiny z float differences between
    # the plane-solve and barycentric formulations may flip rare overlaps)
    fm = frag_map(tris)
    expected = np.vectorize(lambda t: fm.get(int(t), -1))(ovis[inside])
    assert (vis[inside] == expected).mean() > 0.95


def test_big_triangle_path():
    # a triangle covering most of a 128x128 screen exceeds the 32x32 small
    # path and must go through the big path
    tri = [(2.0, 2.0, 0.5, 1.0), (120.0, 4.0, 0.5, 1.0), (3.0, 120.0, 0.5, 1.0)]
    depth, vis = run_raster([tri], width=128, height=128)
    odepth, _ = raster_oracle([tri], 128, 128)
    np.testing.assert_allclose(depth, odepth, atol=2e-5)
    assert (vis != raster.INVALID_FRAG).sum() > 3000


def test_overflow_drops_triangles():
    tris = []
    for i in range(20):
        x = 2.0 + i * 3
        tris.append([(x, 2.0, 0.5, 1.0), (x + 2, 2.0, 0.5, 1.0), (x, 5.0, 0.5, 1.0)])
    # capacity 4: only first 4 survive (deterministic prefix order)
    depth, vis = run_raster(tris, small_capacity=4)
    kept = np.unique(vis[vis != raster.INVALID_FRAG])
    assert len(kept) <= 4
    assert all(raster.INVALID_FRAG != k for k in kept)


def test_subpixel_triangle_no_coverage():
    # a degenerate-thin triangle between pixel centers covers nothing but
    # must not crash or corrupt the framebuffer
    tri = [(10.2, 10.2, 0.5, 1.0), (10.8, 10.2, 0.5, 1.0), (10.2, 10.7, 0.5, 1.0)]
    depth, vis = run_raster([tri])
    assert (depth == 0).all()
    assert (vis == raster.INVALID_FRAG).all()
