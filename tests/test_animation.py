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
