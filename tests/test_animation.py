import numpy as np
import pytest

import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.render import animation, frame as frame_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.ops.raster import INVALID_FRAG


def make_anim(draw_index=0):
    return animation.AnimationTable(
        draw_index=np.array([draw_index], np.int32),
        light_index=np.array([-1], np.int32),
        start_time=np.array([0.0], np.float32),
        period=np.array([0.5], np.float32),
        key_offset=np.array([0], np.int32),
        key_count=np.array([3], np.int32),
        key_translation=np.array([[0, 0, -3], [2, 0, -3], [0, 0, -3]], np.float32),
        key_scale=np.array([1.0, 1.0, 1.0], np.float32),
        key_rotation=np.array([[0, 0, 0, 1]] * 3, np.float32),
    )


def test_evaluate_loops_and_interpolates():
    at = make_anim()
    _, pos, scale, orient, active = animation.evaluate(at, jnp.float32(0.25))
    np.testing.assert_allclose(np.asarray(pos[0]), [1, 0, -3], atol=1e-5)  # halfway key0->key1
    _, pos, _, _, _ = animation.evaluate(at, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(pos[0]), [2, 0, -3], atol=1e-5)
    # wraps modulo keyframeCount like the reference (niagara.cpp:1373)
    _, pos_wrap, _, _, _ = animation.evaluate(at, jnp.float32(1.75))
    np.testing.assert_allclose(np.asarray(pos_wrap[0]), np.asarray(animation.evaluate(at, jnp.float32(0.25))[1][0]), atol=1e-5)


def test_slerp_shortest_path():
    q0 = jnp.array([[0.0, 0, 0, 1]])
    q1 = jnp.array([[0.0, 0, 0, -1]])  # same rotation, opposite sign
    q = animation._slerp(q0, q1, jnp.array([[0.5]]))
    # stays a unit quaternion representing identity
    np.testing.assert_allclose(np.abs(np.asarray(q[0, 3])), 1.0, atol=1e-5)


def test_animated_draw_moves_in_render(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=1)
    draws.position[0] = [0, 0, -3]
    draws.scale[0] = 1.0
    draws.orientation[0] = [0, 0, 0, 1]
    ds = scene_mod.upload(kitten_geometry, draws)
    at = make_anim()

    cfg = frame_mod.FrameConfig(
        width=128, height=128, max_groups=8,
        cmd_capacity=64, cluster_capacity=512,
        small_capacity=1 << 12, big_capacity=32, pair_capacity=1 << 12,
        tri_capacity=1 << 12, raster_interpret=True, bloom=False,
        occlusion_two_pass=False,
    )
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(occlusion=False), cfg)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    state = frame_mod.FrameState(draw_vis=state.draw_vis.at[:].set(1), vis_words=~state.vis_words)

    def centroid_at(t):
        scene_t = animation.apply_to_draws(ds, at, jnp.float32(t))
        _, fb, _, _ = frame_mod.render_frame(scene_t, state, params, sp, cfg)
        vis = np.asarray(fb.vis)
        ys, xs = np.nonzero(vis != INVALID_FRAG)
        assert len(xs) > 50
        return xs.mean()

    x0 = centroid_at(0.0)
    x1 = centroid_at(0.5)  # translated +2 in world x
    assert x1 > x0 + 10  # moved right on screen


def test_config5_animated_shadows_end_to_end(tmp_path):
    """Config-5 end to end (VERDICT r2 item 3): an animated occluder over a
    ground plane, shadows via the static/dynamic sun-map split — the cached
    static tiles never rebuild, the per-frame update rasterizes only the
    animated draw range, and the composited image shows the shadow MOVING
    with the occluder."""
    import dataclasses

    import jax

    from niagara_tpu.cooker.cook import cook_obj_meshes
    from niagara_tpu.ops import sunmap
    from niagara_tpu.utils import math3d

    p1 = tmp_path / "plane.obj"
    p2 = tmp_path / "occ.obj"
    p1.write_text(
        "v -10 0 -10\nv 10 0 -10\nv 10 0 10\nv -10 0 10\nvn 0 1 0\n"
        "f 1//1 3//1 2//1\nf 1//1 4//1 3//1\n")
    p2.write_text(
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\nvn 0 1 0\n"
        "f 1//1 3//1 2//1\nf 1//1 4//1 3//1\n")
    g = cook_obj_meshes([str(p1), str(p2)], build_lods=False)
    draws = synthesize_draws(g.meshes.count, draw_count=2)
    draws.mesh_index[:] = [0, 1]
    draws.position[:] = np.array([[0, 0, 0], [0, 2, 0]], np.float32)
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], np.float32)
    ds = jax.device_put(scene_mod.upload(g, draws))

    # occluder slides +x over one period
    at = animation.AnimationTable(
        draw_index=np.array([1], np.int32),
        light_index=np.array([-1], np.int32),
        start_time=np.array([0.0], np.float32),
        period=np.array([0.5], np.float32),
        key_offset=np.array([0], np.int32),
        key_count=np.array([3], np.int32),
        key_translation=np.array([[0, 2, 0], [4, 2, 0], [0, 2, 0]], np.float32),
        key_scale=np.ones(3, np.float32),
        key_rotation=np.array([[0, 0, 0, 1]] * 3, np.float32),
    )

    # tilted sun: the shadow lands BESIDE the occluder (a straight-down
    # sun + top-down camera would hide the shadow behind the caster)
    sun = np.array([1.0, 1.0, 0.0], np.float32) / np.sqrt(2.0)
    sf = sunmap.fit_sun(sun, [-12, -1, -12], [12, 5, 12])
    caps = dict(cmd_capacity=64, cluster_capacity=64, tri_capacity=1 << 10,
                pair_capacity=1 << 13, interpret=True)
    # static tiles: the ground only (draw 0); built ONCE
    _, _, static_tiles = sunmap.build_static_sun_map(
        ds, sf, map_w=256, map_h=256, batch=1, num_draws=1,
        return_tiles=True, **caps)

    cfg = frame_mod.FrameConfig(
        width=256, height=128, max_groups=8,
        cmd_capacity=64, cluster_capacity=512, pair_capacity=1 << 13,
        tri_capacity=1 << 12, raster_interpret=True, bloom=False,
        occlusion_two_pass=False, shadows=True,
        # this test pins the ANIMATION contract (the shadow moves with the
        # caster); the 10-tap bilateral would wash the small test shadow
        # out at this resolution
        shadow_blur=False,
    )
    # camera above, looking straight down at the ground
    cam = Camera(
        position=np.array([-0.5, 8.0, 0.0], np.float32),
        orientation=math3d.quat_axis_angle(
            np.array([1.0, 0.0, 0.0], np.float32), np.radians(-90.0)),
    )
    params, sp = frame_mod.make_frame_inputs(
        cam, RenderSettings(occlusion=False), cfg, sun_direction=sun)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    state = frame_mod.FrameState(draw_vis=state.draw_vis.at[:].set(1), vis_words=~state.vis_words)

    def frame_at(t):
        scene_t = animation.apply_to_draws(ds, at, jnp.float32(t))
        smap, _, drop = sunmap.update_sun_map(
            scene_t, sf, static_tiles, (jnp.int32(1), jnp.int32(2)),
            map_w=256, map_h=256, **caps)
        assert int(drop) == 0
        image, fb, _, _ = frame_mod.render_frame(
            scene_t, state, params, sp, cfg, bvh=(sf, smap))
        return np.asarray(image), np.asarray(fb.vis)

    def shadow_centroid(img, vis):
        lum = img.sum(axis=-1)
        lit = np.median(lum[vis != INVALID_FRAG])
        dark = (lum < lit * 0.55) & (vis != INVALID_FRAG)
        assert dark.sum() > 30, "no shadow on the ground"
        return np.nonzero(dark)[1].mean()

    img0, vis0 = frame_at(0.0)
    img1, vis1 = frame_at(0.25)  # occluder moved +2 in world x
    c0 = shadow_centroid(img0, vis0)
    c1 = shadow_centroid(img1, vis1)
    assert abs(c1 - c0) > 8, (c0, c1, "shadow did not move with the occluder")
