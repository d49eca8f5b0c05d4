import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu.cooker import bindings
from niagara_tpu.ops import shadow


def make_quad_bvh(z=0.0, size=1.0):
    """Two triangles forming a quad in the plane y=z... actually z=const."""
    v = np.array(
        [[-size, -size, z], [size, -size, z], [size, size, z], [-size, size, z]],
        dtype=np.float32,
    )
    idx = np.array([0, 1, 2, 0, 2, 3], dtype=np.uint32)
    nodes, order = bindings.build_bvh(v, idx)
    tris = v[idx.reshape(-1, 3)][order]
    return jax.device_put(shadow.single_blas(nodes, tris))


def test_bvh_build_shape():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    idx = np.arange(300, dtype=np.uint32)
    nodes, order = bindings.build_bvh(pts, idx)
    assert len(order) == 100
    assert sorted(order.tolist()) == list(range(100))
    # root bbox contains all points
    mn, mx = nodes[0, :3], nodes[0, 3:6]
    assert (pts.min(0) >= mn - 1e-5).all() and (pts.max(0) <= mx + 1e-5).all()
    # root skip points past the end
    skip = nodes[0, 6:7].view(np.int32)[0]
    assert skip == len(nodes)


def test_any_hit_quad():
    bvh = make_quad_bvh(z=0.0, size=1.0)
    origins = jnp.array(
        [
            [0.0, 0.0, -5.0],   # below, ray +z through quad -> hit
            [3.0, 3.0, -5.0],   # misses quad
            [0.0, 0.0, 5.0],    # above, ray +z away from quad -> miss
            [0.5, -0.5, -1.0],  # inside quad extent -> hit
        ]
    )
    dirs = jnp.array([[0.0, 0, 1], [0.0, 0, 1], [0.0, 0, 1], [0.0, 0, 1]])
    hit = np.asarray(shadow.trace_any_hit(bvh, origins, dirs))
    np.testing.assert_array_equal(hit, [True, False, False, True])


def test_any_hit_many_triangles(rng):
    # random soup; rays through the middle nearly always hit, rays far away never
    pts = rng.uniform(-1, 1, size=(900, 3)).astype(np.float32)
    idx = np.arange(900, dtype=np.uint32)
    nodes, order = bindings.build_bvh(pts, idx)
    tris = pts[idx.reshape(-1, 3)][order]
    bvh = jax.device_put(shadow.single_blas(nodes, tris))
    far = jnp.array([[50.0, 50.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert not bool(shadow.trace_any_hit(bvh, far, d)[0])

    # brute-force oracle vs BVH for center rays
    origins = rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float32)
    origins[:, 2] = -3.0
    dirs = np.tile([0.0, 0.0, 1.0], (32, 1)).astype(np.float32)
    got = np.asarray(shadow.trace_any_hit(bvh, jnp.array(origins), jnp.array(dirs)))

    def ray_tri(o, v0, v1, v2):
        e1, e2 = v1 - v0, v2 - v0
        pvec = np.cross([0, 0, 1.0], e2)
        det = e1 @ pvec
        if abs(det) < 1e-12:
            return False
        tvec = o - v0
        u = (tvec @ pvec) / det
        qvec = np.cross(tvec, e1)
        v = np.array([0, 0, 1.0]) @ qvec / det
        t = (e2 @ qvec) / det
        return u >= 0 and v >= 0 and u + v <= 1 and t > 1e-3

    soup = pts[idx.reshape(-1, 3)]
    for i in range(32):
        expect = any(ray_tri(origins[i], *soup[t]) for t in range(len(soup)))
        assert got[i] == expect, i


def test_shadow_pass_occluder(rng):
    """A quad floating above the ground plane must shadow the pixels under
    it when lit straight from above."""
    # scene: looking down -z; ground at z=-10 (depth buffer filled), occluder
    # quad at z=-5 in the upper half.  Sun direction +z (toward the camera).
    bvh = make_quad_bvh(z=-5.0, size=0.5)
    W = H = 128
    depth = jnp.full((H, W), 0.01, jnp.float32)  # ground at viewz 10 (wpos z=-10)

    import numpy.linalg as la
    from niagara_tpu.utils import math3d

    view = math3d.view_matrix(np.zeros(3), math3d.quat_identity())
    proj = math3d.perspective_projection(np.radians(70), 1.0, 0.1)
    inv_vp = np.linalg.inv(proj @ view).astype(np.float32)

    # blur=False: the occluder footprint (~9px) is smaller than the
    # reference's 10-tap blur radius; the filters have their own oracle tests
    sh = shadow.shadow_pass(
        depth, bvh,
        sun_direction=jnp.array([0.0, 0.0, 1.0]),
        inverse_view_projection=jnp.array(inv_vp),
        width=W, height=H, scale=2, checkerboard=True, blur=False,
    )
    sh = np.asarray(sh)
    assert sh.shape == (H, W)
    # center pixels (behind the occluder) are dark, corners are lit
    assert sh[H // 2, W // 2] < 0.4
    assert sh[4, 4] > 0.8


def _world_soup(geometry, draws):
    """Brute-force oracle geometry: every draw's lodRT triangles in world."""
    from niagara_tpu.utils import math3d

    m = geometry.meshes
    out = []
    for d in range(draws.count):
        mi = int(draws.mesh_index[d])
        lod = int(m.lod_rt[mi])
        off = int(m.lod_index_offset[mi, lod])
        cnt = int(m.lod_index_count[mi, lod])
        idx = geometry.indices[off : off + cnt].astype(np.int64)
        tri = geometry.vpos.astype(np.float32)[idx].reshape(-1, 3, 3)
        world = (
            math3d.rotate_quat(tri.reshape(-1, 3), draws.orientation[d]) * draws.scale[d]
            + draws.position[d]
        ).reshape(-1, 3, 3)
        out.append(world)
    return np.concatenate(out, axis=0)


def _brute_any_hit(soup, origins, dirs, t_min=1e-3):
    v0 = soup[:, 0]
    e1 = soup[:, 1] - soup[:, 0]
    e2 = soup[:, 2] - soup[:, 0]
    hits = []
    for o, d in zip(origins, dirs):
        pvec = np.cross(d, e2)
        det = np.einsum("ij,ij->i", e1, pvec)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, e1)
        v = np.einsum("ij,ij->i", np.broadcast_to(d, e1.shape), qvec) * inv
        t = np.einsum("ij,ij->i", e2, qvec) * inv
        hits.append(bool(np.any(ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min))))
    return np.array(hits)


def test_two_level_matches_brute_force(kitten_geometry, rng):
    """Instanced scene: two-level TLAS/BLAS traversal matches a brute-force
    world-space any-hit oracle."""
    from niagara_tpu.cooker.synth import synthesize_draws

    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=6)
    bvh, static = shadow.build_scene_rt(kitten_geometry, draws)
    bvh = jax.device_put(bvh)

    soup = _world_soup(kitten_geometry, draws)

    # aim most rays at per-instance centroids (hits), jitter some away (misses)
    targets = np.asarray(draws.position, np.float32)[
        rng.integers(0, draws.count, 64)
    ] + rng.normal(scale=0.2, size=(64, 3)).astype(np.float32) * np.asarray(
        draws.scale, np.float32
    ).mean()
    targets[48:] += rng.normal(scale=30.0, size=(16, 3))  # far misses
    origins = (targets + rng.normal(scale=20.0, size=(64, 3))).astype(np.float32)
    dirs = (targets - origins).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    got = np.asarray(shadow.trace_any_hit(bvh, jnp.array(origins), jnp.array(dirs), max_steps=4096))
    expect = _brute_any_hit(soup, origins, dirs)
    np.testing.assert_array_equal(got, expect)
    assert expect.any() and not expect.all(), "oracle must exercise both outcomes"


def test_tlas_refit_moves_instances(kitten_geometry):
    """Animation path: refit_tlas rebuilds only the instance level and the
    moved instance occludes at its new location."""
    from niagara_tpu.cooker.synth import synthesize_draws

    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=2)
    draws.position[:] = [[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]]
    draws.scale[:] = 1.0
    draws.orientation[:] = [0.0, 0.0, 0.0, 1.0]
    bvh0, static = shadow.build_scene_rt(kitten_geometry, draws)

    # ray through the first instance's centroid
    root = static["blas_roots"][int(draws.mesh_index[0])]
    c = (root[0:3] + root[3:6]) * 0.5
    o = np.array([c + [0, 0, -50]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    assert bool(shadow.trace_any_hit(jax.device_put(bvh0), jnp.array(o), jnp.array(d), max_steps=4096)[0])

    # move instance 0 far away and refit: same BLAS bytes, new TLAS
    draws.position[0] = [0.0, 500.0, 0.0]
    bvh1 = shadow.refit_tlas(static, draws)
    # byte-compare: skip/leaf int bits reinterpreted as float may be NaN
    assert (
        np.asarray(bvh1.nodes[: bvh1.tlas_base]).tobytes()
        == np.asarray(bvh0.nodes[: bvh0.tlas_base]).tobytes()
    )
    assert not bool(shadow.trace_any_hit(jax.device_put(bvh1), jnp.array(o), jnp.array(d), max_steps=4096)[0])
    o2 = o + np.array([[0.0, 500.0, 0.0]], np.float32)
    assert bool(shadow.trace_any_hit(jax.device_put(bvh1), jnp.array(o2), jnp.array(d), max_steps=4096)[0])


def test_checkerboard_fill_matches_scalar_oracle(rng):
    """shadowfill.comp.glsl:25-45 transcription: depth-similarity weights."""
    sh, sw = 16, 16
    shadow_in = rng.uniform(0, 1, (sh, sw)).astype(np.float32)
    d = rng.uniform(0.1, 1.0, (sh, sw)).astype(np.float32)
    got = np.asarray(shadow.checkerboard_fill(jnp.array(shadow_in), jnp.array(d), parity=0))

    for y in range(sh):
        for x in range(sw):
            if (x + y) % 2 == 0:
                assert got[y, x] == shadow_in[y, x]
                continue
            ns, nd = [], []
            for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ns.append(shadow_in[(y + dy) % sh, (x + dx) % sw])
                nd.append(d[(y + dy) % sh, (x + dx) % sw])
            w = np.exp2(-np.abs(np.array(nd) / d[y, x] - 1) * 20).astype(np.float32)
            expect = float(w @ np.array(ns) / (w.sum() + 1e-2))
            assert got[y, x] == pytest.approx(expect, rel=1e-5)


def test_shadow_blur_matches_scalar_oracle(rng):
    """shadowblur.comp.glsl:36-58 transcription: gaussian x depth-gradient
    bilateral, KERNEL=10, separable H then V."""
    sh, sw = 8, 40
    znear = 0.1
    shadow_in = rng.uniform(0, 1, (sh, sw)).astype(np.float32)
    d = rng.uniform(0.05, 1.0, (sh, sw)).astype(np.float32)
    got = np.asarray(shadow.shadow_blur(jnp.array(shadow_in), jnp.array(d), znear))

    def blur_1d(img, lin, axis):
        out = np.empty_like(img)
        K = shadow.SHADOW_BLUR_KERNEL
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                acc = img[y, x]
                accw = 1.0
                depth = lin[y, x]
                for sign in (-1, 1):
                    if axis == 1:
                        nxt = lin[y, (x + sign) % img.shape[1]]
                    else:
                        nxt = lin[(y + sign) % img.shape[0], x]
                    dgrad = (nxt - depth) if abs(depth - nxt) < 0.1 else 0.0
                    for i in range(1, K + 1):
                        if axis == 1:
                            sv = img[y, (x + sign * i) % img.shape[1]]
                            dv = lin[y, (x + sign * i) % img.shape[1]]
                        else:
                            sv = img[(y + sign * i) % img.shape[0], x]
                            dv = lin[(y + sign * i) % img.shape[0], x]
                        fw = np.exp2(-i * i / 50.0) * np.exp2(-abs(dv - (depth + dgrad * i)) * 100.0)
                        acc += sv * fw
                        accw += fw
                out[y, x] = acc / accw
        return out

    lin = znear / d
    expect = blur_1d(shadow_in, lin, axis=1)
    expect = blur_1d(expect, lin, axis=0)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_alpha_tested_any_hit():
    """QUALITY-1: rays through mask-transparent regions of an alpha-tested
    occluder must NOT report occlusion; opaque-cell rays must."""
    v = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], dtype=np.float32
    )
    idx = np.array([0, 1, 2, 0, 2, 3], dtype=np.uint32)
    nodes, order = bindings.build_bvh(v, idx)
    tris = v[idx.reshape(-1, 3)][order]
    bvh = shadow.single_blas(nodes, tris)

    # uv == (x,y) normalized to [0,1]; mask: left half (u<0.5) transparent
    uvs = (v[:, :2] + 1) * 0.5
    t3 = idx.reshape(-1, 3)[order]
    tri_uv = np.zeros((2, 8), np.float32)
    tri_uv[:, 0:6] = uvs[t3].reshape(-1, 6)
    cells = np.zeros((8, 8), bool)
    cells[:, 4:] = True
    m = (cells.reshape(64).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        dtype=np.uint64
    )
    row = np.zeros(8, np.float32)
    for h in range(4):
        row[h] = float((m >> np.uint64(16 * h)) & np.uint64(0xFFFF))
    row[4:8] = [0, 0, 8, 8]
    tri_alpha = np.tile(row, (2, 1))

    import dataclasses

    bvh = dataclasses.replace(bvh, tri_uv=tri_uv, tri_alpha=tri_alpha)
    bvh = jax.device_put(bvh)

    # x=-0.6 -> u=0.2 transparent; x=+0.6 -> u=0.8 opaque
    o = jnp.array([[-0.6, 0.0, -5.0], [0.6, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit_q0 = np.asarray(shadow.trace_any_hit(bvh, o, d))
    hit_q1 = np.asarray(shadow.trace_any_hit(bvh, o, d, alpha_test=True))
    np.testing.assert_array_equal(hit_q0, [True, True])  # opaque-only: both occlude
    np.testing.assert_array_equal(hit_q1, [False, True])  # alpha-tested punches through


def test_chunked_trace_matches_single_loop(rng):
    """trace_any_hit_chunked (host-synced rounds, early exit) must produce
    the same occlusion bits as the single while_loop trace."""
    pts = rng.uniform(-1, 1, size=(900, 3)).astype(np.float32)
    idx = np.arange(900, dtype=np.uint32)
    nodes, order = bindings.build_bvh(pts, idx)
    tris = pts[idx.reshape(-1, 3)][order]
    bvh = jax.device_put(shadow.single_blas(nodes, tris))
    origins = rng.uniform(-2, 2, size=(128, 3)).astype(np.float32)
    origins[:, 2] = -3.0
    dirs = np.tile([0.0, 0.0, 1.0], (128, 1)).astype(np.float32)
    ref = np.asarray(shadow.trace_any_hit(bvh, jnp.array(origins), jnp.array(dirs)))
    # tiny rounds force many host-loop iterations + the early-exit path
    got = np.asarray(
        shadow.trace_any_hit_chunked(
            bvh, jnp.array(origins), jnp.array(dirs), round_steps=17, max_rounds=200
        )
    )
    np.testing.assert_array_equal(ref, got)
