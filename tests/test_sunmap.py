"""Rasterized sun shadow map (ops/sunmap.py) — the TPU-native fast path for
the reference's RT sun shadows.  Checks: an occluder shadows the ground
exactly under its sun-projected footprint, and the map path agrees with the
BVH-traced path on the same scene."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu.cooker.cook import cook_obj_meshes
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import shadow, sunmap
from niagara_tpu.scene import upload

QUAD_OVER_PLANE = """
# big ground plane at y=0 (two triangles), small square occluder at y=2
v -10 0 -10
v  10 0 -10
v  10 0  10
v -10 0  10
vn 0 1 0
f 1//1 3//1 2//1
f 1//1 4//1 3//1
"""

OCCLUDER = """
v -1 0 -1
v  1 0 -1
v  1 0  1
v -1 0  1
vn 0 1 0
f 1//1 3//1 2//1
f 1//1 4//1 3//1
"""


def _scene(tmp_path):
    p1 = tmp_path / "plane.obj"
    p2 = tmp_path / "occ.obj"
    p1.write_text(QUAD_OVER_PLANE)
    p2.write_text(OCCLUDER)
    g = cook_obj_meshes([str(p1), str(p2)], build_lods=False)
    draws = synthesize_draws(g.meshes.count, draw_count=2)
    draws.mesh_index[:] = [0, 1]
    draws.position[:] = np.array([[0, 0, 0], [0, 2, 0]], np.float32)
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], np.float32)
    return g, draws


def test_sun_map_shadows_footprint(tmp_path):
    g, draws = _scene(tmp_path)
    scene = jax.device_put(upload(g, draws))
    sun = np.array([0.0, 1.0, 0.0], np.float32)  # straight down: footprint == occluder
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 3, 12])

    smap, _, dropped = sunmap.render_sun_map(
        scene, sf, camera_position=jnp.zeros(3), lod_target=jnp.float32(1e-6),
        lod_enabled=jnp.int32(0), map_w=256, map_h=256,
        cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
        pair_capacity=1 << 12, interpret=True,
    )
    assert int(dropped) == 0
    smap = np.asarray(smap)
    assert (smap > 0).sum() > 1000, "sun map is empty"

    # sample points on the ground: directly under the occluder -> shadowed;
    # far away on the plane -> lit
    pts = jnp.array([
        [0.0, 0.0, 0.0],   # under the occluder
        [0.5, 0.0, 0.5],   # still under (occluder spans +-1)
        [5.0, 0.0, 5.0],   # open ground
        [-8.0, 0.0, 3.0],  # open ground
    ])
    term = np.asarray(sunmap.sample_shadow(jnp.asarray(smap), sf, pts))
    assert term[0] < 0.25, term
    assert term[1] < 0.25, term
    assert term[2] > 0.75, term
    assert term[3] > 0.75, term


def test_sun_map_matches_rt_trace(tmp_path):
    """Map-path shadow decisions match the BVH-traced path on the same
    scene (away from the footprint boundary where the two sampling patterns
    legitimately differ)."""
    g, draws = _scene(tmp_path)
    scene = jax.device_put(upload(g, draws))
    sun = np.array([0.2, 1.0, 0.1], np.float32)
    sun = sun / np.linalg.norm(sun)
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 3, 12])
    smap, _, _ = sunmap.render_sun_map(
        scene, sf, camera_position=jnp.zeros(3), lod_target=jnp.float32(1e-6),
        lod_enabled=jnp.int32(0), map_w=512, map_h=512,
        cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
        pair_capacity=1 << 13, interpret=True,
    )

    bvh, _ = shadow.build_scene_rt(g, draws)
    bvh = jax.device_put(bvh)

    rng = np.random.default_rng(0)
    pts = np.zeros((128, 3), np.float32)
    pts[:, 0] = rng.uniform(-9, 9, 128)
    pts[:, 2] = rng.uniform(-9, 9, 128)
    pts[:, 1] = 0.01  # just above the ground plane

    dirs = np.tile(sun, (128, 1)).astype(np.float32)
    occ_rt = np.asarray(shadow.trace_any_hit(bvh, jnp.asarray(pts), jnp.asarray(dirs)))
    term_map = np.asarray(sunmap.sample_shadow(smap, sf, jnp.asarray(pts)))

    # compare only points decisively inside/outside the footprint: project
    # the point along the sun to the occluder plane (y=2) and keep points
    # >2 texels from the square's edge
    t = (2.0 - pts[:, 1]) / sun[1]
    foot = pts + t[:, None] * sun[None, :]
    margin = 24.0 / 512 * 2  # 2 texels in world units
    inside = (np.abs(foot[:, 0]) < 1 - margin) & (np.abs(foot[:, 2]) < 1 - margin)
    outside = (np.abs(foot[:, 0]) > 1 + margin) | (np.abs(foot[:, 2]) > 1 + margin)
    decisive = inside | outside

    agree = (term_map < 0.5) == occ_rt
    assert agree[decisive].mean() > 0.97, (
        f"map vs rt disagreement {1 - agree[decisive].mean():.3f}"
    )


def test_static_map_batched_matches_single(tmp_path):
    """build_static_sun_map's draw-id batching (cached-map path for 1M-draw
    scenes) must produce the same map as one unbatched render."""
    g, draws = _scene(tmp_path)
    scene = jax.device_put(upload(g, draws))
    sun = np.array([0.1, 1.0, 0.2], np.float32)
    sun /= np.linalg.norm(sun)
    sf = sunmap.fit_sun_to_draws(sun, draws, margin=12.0)
    ext = np.asarray(sf["hi"] - sf["lo"])
    texel = float(max(ext[0] / 256, ext[1] / 256))
    single, _, _ = sunmap.render_sun_map(
        scene, sf, map_w=256, map_h=256, texel_world=texel,
        cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
        pair_capacity=1 << 12, interpret=True,
    )
    batched, dropped = sunmap.build_static_sun_map(
        scene, sf, map_w=256, map_h=256, batch=1,
        cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
        pair_capacity=1 << 12, interpret=True,
    )
    assert int(dropped) == 0
    # jit-vs-eager FMA contraction differs by a few ulps through the
    # edge-equation/depth-plane chain
    np.testing.assert_allclose(np.asarray(single), np.asarray(batched), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(single) > 0, np.asarray(batched) > 0)


def test_incremental_update_matches_full_rebuild(tmp_path):
    """Animated scenes (VERDICT r2 item 3): the static/dynamic split —
    cached static tiles + a per-frame raster of only the animated draw
    range — must produce exactly the map a full rebuild would, and the
    shadow must follow the moving occluder."""
    import dataclasses

    g, draws = _scene(tmp_path)
    scene = jax.device_put(upload(g, draws))
    sun = np.array([0.0, 1.0, 0.0], np.float32)
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 3, 12])
    caps = dict(cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
                pair_capacity=1 << 12, interpret=True)

    # draw 0 = static ground, draw 1 = animated occluder (tail id range)
    _, _, static_tiles = sunmap.build_static_sun_map(
        scene, sf, map_w=256, map_h=256, batch=1, num_draws=1,
        return_tiles=True, **caps)

    def at_x(x):
        pos = jnp.asarray(scene.draw_position).at[1, 0].set(x)
        xf = jnp.asarray(scene.draw_xform_row).at[1, 0].set(x)
        return dataclasses.replace(scene, draw_position=pos, draw_xform_row=xf)

    for x in (0.0, 4.0):
        moved = at_x(x)
        inc, _, drop = sunmap.update_sun_map(
            moved, sf, static_tiles, (jnp.int32(1), jnp.int32(2)),
            map_w=256, map_h=256, **caps)
        assert int(drop) == 0
        full, _ = sunmap.build_static_sun_map(
            moved, sf, map_w=256, map_h=256, batch=1, **caps)
        # jit-vs-eager FMA contraction ulps (same bound as the batched test)
        np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(inc) > 0, np.asarray(full) > 0)

        pts = jnp.array([[x, 0.0, 0.0], [x - 4.0, 0.0, 0.0]])
        term = np.asarray(sunmap.sample_shadow(inc, sf, pts))
        assert term[0] < 0.25, (x, term)  # under the occluder's new spot
        assert term[1] > 0.75, (x, term)  # old spot is lit again

        # the tail-sliced form (bench.py's per-frame path: the update sees
        # ONLY the animated draws as a scene.slice_draws view — [tail]-scale
        # cull instead of [D]) must produce the IDENTICAL map
        inc_sliced, _, drop_s = sunmap.update_sun_map(
            moved.slice_draws(1, 2), sf, static_tiles, None,
            map_w=256, map_h=256, **caps)
        assert int(drop_s) == 0
        np.testing.assert_array_equal(np.asarray(inc_sliced), np.asarray(inc))


def test_packed_resolve_matches_unpacked(tmp_path):
    """sample_shadow_packed (one 16-byte row gather per position) must make
    bit-identical lit/shadow decisions to sample_shadow's four element
    gathers, including at the map border where the clamped-tap algebra is
    replaced by fractional-weight zeroing."""
    g, draws = _scene(tmp_path)
    scene = jax.device_put(upload(g, draws))
    sun = np.array([0.3, 1.0, -0.2], np.float32)
    sun /= np.linalg.norm(sun)
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 3, 12])
    smap, _, _ = sunmap.render_sun_map(
        scene, sf, camera_position=jnp.zeros(3), lod_target=jnp.float32(1e-6),
        lod_enabled=jnp.int32(0), map_w=128, map_h=128,
        cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
        pair_capacity=1 << 12, interpret=True,
    )
    packed = sunmap.pack_sun_map(smap)

    rng = np.random.default_rng(7)
    pts = np.zeros((512, 3), np.float32)
    # include points well past the map border to stress the clamp path
    pts[:, 0] = rng.uniform(-20, 20, 512)
    pts[:, 2] = rng.uniform(-20, 20, 512)
    pts[:, 1] = rng.uniform(-0.5, 2.5, 512)

    a = np.asarray(sunmap.sample_shadow(smap, sf, jnp.asarray(pts)))
    b = np.asarray(sunmap.sample_shadow_packed(packed, 128, 128, sf, jnp.asarray(pts)))
    np.testing.assert_allclose(a, b, atol=1e-6)

    # and through the full-screen pass contract
    depth = jnp.full((32, 32), 0.5, jnp.float32)
    ivp = jnp.eye(4)
    t1 = sunmap.shadow_map_pass(
        depth, sf, smap, inverse_view_projection=ivp, width=32, height=32, scale=1)
    t2 = sunmap.shadow_map_pass(
        depth, sf, None, inverse_view_projection=ivp, width=32, height=32, scale=1,
        packed=packed, map_shape=(128, 128))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


OCCLUDER_UV = """
v -1 0 -1
v  1 0 -1
v  1 0  1
v -1 0  1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 1 0
f 1/1/1 3/3/1 2/2/1
f 1/1/1 4/4/1 3/3/1
"""


def test_cutout_caster_holed_shadow(tmp_path):
    """VERDICT r2 item 5: alpha-tested casters in the sun map.  A
    half-transparent occluder (u < 0.5 cut out) must cast a HOLED shadow in
    the map path, agreeing with the RT any-hit trace (QUALITY 1)."""
    from niagara_tpu.cooker.opacity import bake_opacity

    p1 = tmp_path / "plane.obj"
    p2 = tmp_path / "occ.obj"
    p1.write_text(QUAD_OVER_PLANE)
    p2.write_text(OCCLUDER_UV)
    g = cook_obj_meshes([str(p1), str(p2)], build_lods=False)
    draws = synthesize_draws(g.meshes.count, draw_count=2)
    draws.mesh_index[:] = [0, 1]
    draws.position[:] = np.array([[0, 0, 0], [0, 2, 0]], np.float32)
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], np.float32)
    draws.post_pass[:] = [0, 1]  # occluder is alpha-tested (postPass 1)
    draws.material_index[:] = 0

    # albedo alpha: left half (u < 0.5) transparent
    tex = np.zeros((64, 64, 4), np.uint8)
    tex[:, 32:, :] = 255
    texture_mips = [[tex]]
    materials = {
        "diffuse": np.ones((1, 4), np.float32),
        "specular": np.ones((1, 4), np.float32),
        "emissive": np.zeros((1, 3), np.float32),
        "textures": np.array([[0, -1, -1, -1]], np.int32),
    }
    masks = bake_opacity(g, draws, materials, texture_mips)
    assert masks is not None and (masks[..., 6] > 0).any()
    scene = jax.device_put(upload(g, draws, materials, masks))
    assert scene.has_alpha_masks

    sun = np.array([0.0, 1.0, 0.0], np.float32)  # straight down
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 3, 12])
    smap, _, dropped = sunmap.render_sun_map(
        scene, sf, camera_position=jnp.zeros(3), lod_target=jnp.float32(1e-6),
        lod_enabled=jnp.int32(0), map_w=256, map_h=256,
        cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
        pair_capacity=1 << 12, interpret=True,
    )
    assert int(dropped) == 0

    # ground points: u maps x in [-1,1] -> [0,1]; x<0 is under the cutout
    pts = np.array([
        [-0.5, 0.0, 0.0],  # under transparent half -> LIT
        [0.5, 0.0, 0.0],   # under opaque half -> SHADOWED
        [5.0, 0.0, 5.0],   # open ground -> LIT
    ], np.float32)
    term = np.asarray(sunmap.sample_shadow(smap, sf, jnp.asarray(pts)))
    assert term[0] > 0.75, term
    assert term[1] < 0.25, term
    assert term[2] > 0.75, term

    # agreement with the RT QUALITY-1 any-hit on the same bake
    bvh, _ = shadow.build_scene_rt(g, draws, materials, texture_mips)
    bvh = jax.device_put(bvh)
    occ = np.asarray(shadow.trace_any_hit(
        jax.device_put(bvh), jnp.asarray(pts), jnp.broadcast_to(jnp.asarray(sun), (3, 3)),
        alpha_test=True,
    ))
    np.testing.assert_array_equal(occ, [False, True, False])


def test_dirty_row_window_matches_full(tmp_path):
    """Dirty-row update (VERDICT r4 #4): updating only the tile-row band the
    animated caster touches must reproduce the FULL update bit-for-bit —
    band rows identical, rows outside untouched, and the pack_band-spliced
    quad table identical to repacking the whole map."""
    import dataclasses

    g, draws = _scene(tmp_path)
    scene = jax.device_put(upload(g, draws))
    sun = np.array([0.0, 1.0, 0.0], np.float32)
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 3, 12])
    caps = dict(cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
                pair_capacity=1 << 12, interpret=True)
    map_wh = 256

    _, _, static_tiles = sunmap.build_static_sun_map(
        scene, sf, map_w=map_wh, map_h=map_wh, batch=1, num_draws=1,
        return_tiles=True, **caps)
    smap_static = sunmap.raster_tile.tiles_to_image(static_tiles, map_wh, map_wh)
    packed_static = sunmap.pack_sun_map(smap_static)

    def at_z(z):
        pos = jnp.asarray(scene.draw_position).at[1, 2].set(z)
        xf = jnp.asarray(scene.draw_xform_row).at[1, 2].set(z)
        return dataclasses.replace(scene, draw_position=pos, draw_xform_row=xf)

    for z in (0.0, 3.0, -6.0):
        moved = at_z(z)
        tail = moved.slice_draws(1, 2)
        win = sunmap.dirty_tile_rows(
            sf, np.asarray(jax.device_get(tail.draw_position)),
            float(np.asarray(jax.device_get(tail.draw_mesh_row))[0, 3]),
            map_wh, margin=0.5)
        row0, n_rows = win
        assert n_rows < map_wh // sunmap.TILE_H, "window should be partial"

        full_img, _, drop_f = sunmap.update_sun_map(
            tail, sf, static_tiles, None, map_w=map_wh, map_h=map_wh, **caps)
        band_img, _, drop_b = sunmap.update_sun_map(
            tail, sf, static_tiles, None, map_w=map_wh, map_h=map_wh,
            row_window=win, **caps)
        assert int(drop_f) == 0 and int(drop_b) == 0

        a, b = row0 * sunmap.TILE_H, (row0 + n_rows) * sunmap.TILE_H
        full_np = np.asarray(full_img)
        np.testing.assert_array_equal(np.asarray(band_img), full_np[a:b])

        merged = np.asarray(smap_static).copy()
        merged[a:b] = np.asarray(band_img)
        np.testing.assert_array_equal(merged, full_np)

        packed = sunmap.pack_band(
            packed_static, band_img, a, map_wh,
            row_above=smap_static[a - 1] if a > 0 else None,
            row_below=smap_static[b] if b < map_wh else None)
        np.testing.assert_array_equal(
            np.asarray(packed), np.asarray(sunmap.pack_sun_map(full_img)))
