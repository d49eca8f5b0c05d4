import numpy as np
import pytest

from niagara_tpu import config, scene
from niagara_tpu.cooker import bindings, cook
from niagara_tpu.utils import math3d


def make_grid_mesh(n=16):
    """Regular grid of (n-1)^2*2 triangles in the xy plane."""
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    positions = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=-1).astype(np.float32)
    tris = []
    for y in range(n - 1):
        for x in range(n - 1):
            i = y * n + x
            tris += [[i, i + 1, i + n], [i + 1, i + n + 1, i + n]]
    return positions, np.array(tris, dtype=np.uint32).reshape(-1)


def test_fp16_quantization_matches_numpy(rng):
    """C++ f32_to_f16 (exercised through OBJ cooking) must match numpy RNE."""
    vals = np.concatenate(
        [
            rng.normal(size=100).astype(np.float32),
            np.array([0.0, -0.0, 1.0, 65504.0, 1e-8, 6e-8, 1e5], dtype=np.float32),
        ]
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.obj")
        with open(path, "w") as f:
            for i in range(0, len(vals) - 2, 3):
                f.write(f"v {float(vals[i])!r} {float(vals[i+1])!r} {float(vals[i+2])!r}\n")
            f.write("f 1 2 3\n")
        flat = bindings.load_obj(path)

    n = (len(vals) // 3) * 3
    got = np.stack([flat["vx"], flat["vy"], flat["vz"]], axis=-1)[: n // 3].reshape(-1)
    expected = math3d.quantize_half(vals[:n])
    np.testing.assert_array_equal(got[:3], expected[:3])


def test_load_obj_kitten(kitten_flat):
    assert len(kitten_flat) == 28944 * 3  # triangle count from the OBJ
    # normals are packed snorm10; positions roundtrip through fp16
    pos = math3d.dequantize_half(kitten_flat["vx"])
    assert np.all(np.isfinite(pos))
    assert np.abs(pos).max() < 10


def test_vertex_remap_dedups():
    v = np.zeros(6, dtype=bindings.VERTEX_DTYPE)
    v["vx"] = [1, 2, 1, 3, 2, 1]
    lib = bindings.get_lib()
    remap = np.zeros(6, dtype=np.uint32)
    unique = lib.ck_generate_vertex_remap(
        bindings._ptr(remap), bindings._ptr(v), 6
    )
    assert unique == 3
    np.testing.assert_array_equal(remap, [0, 1, 0, 2, 1, 0])


def test_optimize_vertex_cache_preserves_triangles():
    positions, indices = make_grid_mesh(10)
    orig = set(map(tuple, np.sort(indices.reshape(-1, 3), axis=1).tolist()))
    out = indices.copy()
    bindings.get_lib().ck_optimize_vertex_cache(bindings._ptr(out), len(out), len(positions))
    new = set(map(tuple, np.sort(out.reshape(-1, 3), axis=1).tolist()))
    assert orig == new


def test_build_meshlets_covers_all_triangles():
    positions, indices = make_grid_mesh(20)
    mv, mt, vc, tc = bindings.build_meshlets(positions, indices)
    assert np.all(vc <= config.MESH_MAXVTX)
    assert np.all(tc <= config.MESH_MAXTRI)
    assert tc.sum() == len(indices) // 3

    # every input triangle appears exactly once across meshlets
    seen = []
    for m in range(len(vc)):
        for t in range(tc[m]):
            tri = [mv[m][mt[m, t, k]] for k in range(3)]
            seen.append(tuple(sorted(tri)))
    orig = sorted(map(tuple, np.sort(indices.reshape(-1, 3), axis=1).tolist()))
    assert sorted(seen) == orig


def test_meshlet_bounds_contain_vertices():
    positions, indices = make_grid_mesh(20)
    # perturb z so the mesh isn't planar
    positions[:, 2] = np.sin(positions[:, 0] * 7) * 0.2
    mv, mt, vc, tc = bindings.build_meshlets(positions, indices)
    for m in range(len(vc)):
        out = bindings.compute_meshlet_bounds(positions, mv[m, : vc[m]], mt[m, : tc[m]])
        center, radius = out[:3], out[3]
        pts = positions[mv[m, : vc[m]]]
        dist = np.linalg.norm(pts - center, axis=1)
        assert dist.max() <= radius + 1e-5


def test_meshlet_cone_is_conservative():
    """All triangle normals must lie within the quantized cone: for every
    triangle normal n, dot(n, axis) >= cos of cone angle; equivalently the
    cull test must never cull a meshlet whose triangles can face the camera."""
    positions, indices = make_grid_mesh(12)
    positions[:, 2] = positions[:, 0] ** 2 * 0.3
    mv, mt, vc, tc = bindings.build_meshlets(positions, indices)
    for m in range(len(vc)):
        out = bindings.compute_meshlet_bounds(positions, mv[m, : vc[m]], mt[m, : tc[m]])
        axis, cutoff = out[4:7], out[7]
        if cutoff >= 1.0:
            continue
        mindot_allowed = np.sqrt(max(0.0, 1 - cutoff * cutoff))
        for t in range(tc[m]):
            a, b, c = (positions[mv[m][mt[m, t, k]]] for k in range(3))
            n = np.cross(b - a, c - a)
            ln = np.linalg.norm(n)
            if ln == 0:
                continue
            n /= ln
            assert np.dot(n, axis) >= mindot_allowed - 1e-5


def test_simplify_reduces_and_preserves_shape():
    positions, indices = make_grid_mesh(24)
    target = len(indices) // 3
    out, err = bindings.simplify(indices, positions, target)
    assert len(out) <= target + 3
    assert len(out) % 3 == 0
    assert len(out) > 0
    # planar grid: simplification error should be ~0 (all points coplanar)
    assert err < 1e-3
    # surviving indices reference valid vertices
    assert out.max() < len(positions)


def test_simplify_error_grows_on_curved_surface(rng):
    n = 24
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    zs = np.sin(xs * 6) * np.cos(ys * 6) * 0.3
    positions = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=-1).astype(np.float32)
    _, indices = make_grid_mesh(n)
    out, err = bindings.simplify(indices, positions, len(indices) // 4)
    assert err > 0.0
    assert len(out) < len(indices)


def test_cook_kitten_end_to_end(kitten_geometry):
    g = kitten_geometry
    m = g.meshes
    assert m.count == 1
    assert m.lod_count[0] >= 4
    # vertices deduplicated to roughly the OBJ's unique corner count
    assert 14000 < g.vertex_count < 17000
    # LOD errors are monotonically non-decreasing
    errs = m.lod_error[0, : m.lod_count[0]]
    assert np.all(np.diff(errs) >= 0)
    # LOD sizes decrease
    counts = m.lod_index_count[0, : m.lod_count[0]]
    assert np.all(np.diff(counts.astype(np.int64)) < 0)
    # meshlet ranges tile the meshlet array exactly
    total = m.lod_meshlet_count[0, : m.lod_count[0]].sum()
    assert total == g.meshlets.count
    # radius covers the mesh
    pos = g.vpos.astype(np.float32)
    dist = np.linalg.norm(pos - m.center[0], axis=1)
    assert dist.max() <= m.radius[0] * 1.001


def test_unpack_meshlet_refs(kitten_geometry):
    g = kitten_geometry
    vertex_ids, tris = scene.unpack_meshlet_refs(g)
    ml = g.meshlets
    # all referenced vertices in range, local tri indices < vertex_count
    for m in range(0, ml.count, 97):
        vc = ml.vertex_count[m]
        tc = ml.triangle_count[m]
        assert vertex_ids[m, :vc].max() < g.vertex_count
        assert tris[m, :tc].max() < vc

    # LOD0 meshlet triangles must reproduce the LOD0 index buffer as a set
    mesh = g.meshes
    lod0_indices = g.indices[: mesh.lod_index_count[0, 0]].reshape(-1, 3)
    orig = set(map(tuple, np.sort(lod0_indices, axis=1).tolist()))
    got = set()
    for m in range(mesh.lod_meshlet_offset[0, 0], mesh.lod_meshlet_offset[0, 0] + mesh.lod_meshlet_count[0, 0]):
        tc = ml.triangle_count[m]
        glob = vertex_ids[m][tris[m, :tc]]
        for tri in np.sort(glob, axis=1).tolist():
            got.add(tuple(tri))
    assert got == orig


def test_scene_cache_roundtrip(tmp_path, kitten_geometry):
    g = kitten_geometry
    cache = str(tmp_path / "kitten.cache.npz")
    cook.save_scene_cache(cache, g, source_hash=0xDEADBEEF)
    loaded = cook.load_scene_cache(cache, source_hash=0xDEADBEEF)
    assert loaded is not None
    np.testing.assert_array_equal(loaded.indices, g.indices)
    np.testing.assert_array_equal(loaded.meshlets.data_offset, g.meshlets.data_offset)
    np.testing.assert_array_equal(loaded.vpos, g.vpos)
    # wrong hash -> cache miss
    assert cook.load_scene_cache(cache, source_hash=0x1234) is None


def test_upload_device_scene(kitten_geometry):
    from niagara_tpu.cooker.synth import synthesize_draws

    g = kitten_geometry
    draws = synthesize_draws(g.meshes.count, draw_count=64)
    ds = scene.upload(g, draws)
    assert ds.num_draws == 64
    slots_per_draw = (g.meshes.lod_meshlet_count[0].max() + 63) // 64 * 64
    assert ds.meshlet_visibility_count == 64 * slots_per_draw
    # visibility offsets strictly increasing by the 64-aligned slot count
    diffs = np.diff(ds.draw_vis_offset)
    assert np.all(diffs == slots_per_draw)
    # normals decoded to unit-ish vectors
    ln = np.linalg.norm(ds.normals, axis=1)
    assert np.percentile(ln, 5) > 0.9
