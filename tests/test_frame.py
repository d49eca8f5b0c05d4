import numpy as np
import pytest

import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.ops.raster import INVALID_FRAG


CFG = frame_mod.FrameConfig(
    width=128,
    height=128,
    max_groups=8,
    cmd_capacity=1 << 10,
    cluster_capacity=1 << 12,
    small_capacity=1 << 16,
    big_capacity=128,
    pair_capacity=1 << 14,
    raster_interpret=True,  # CPU tests run the Pallas kernel interpreted
)

# scatter-merge fallback config (same scene, same expectations)
CFG_SCATTER = frame_mod.FrameConfig(
    width=128,
    height=128,
    max_groups=8,
    cmd_capacity=1 << 10,
    cluster_capacity=1 << 12,
    small_capacity=1 << 16,
    big_capacity=128,
    use_tile_raster=False,
)


@pytest.fixture(scope="module")
def tiny_scene(kitten_geometry):
    # a handful of kittens right in front of the camera
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=8)
    draws.position[:] = np.array([[0.0, 0.0, -3.0]]) + np.array([[0.8, 0.0, 0.0]]) * (
        np.arange(8)[:, None] - 3.5
    )
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], dtype=np.float32)
    return scene_mod.upload(kitten_geometry, draws)


def render(scene, state=None, settings=None, cfg=CFG):
    cam = Camera()
    settings = settings or RenderSettings()
    params, sp = frame_mod.make_frame_inputs(cam, settings, cfg)
    if state is None:
        state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)
    return frame_mod.render_frame(scene, state, params, sp, cfg)


def test_tile_and_scatter_rasterizers_agree(tiny_scene):
    _, fb_t, _, _ = render(tiny_scene)
    _, fb_s, _, _ = render(tiny_scene, cfg=CFG_SCATTER)
    vis_t, vis_s = np.asarray(fb_t.vis), np.asarray(fb_s.vis)
    # overlapping kittens z-fight at the ulp level, so a few percent of
    # winners legitimately flip between the two compilations (the XLA path
    # contracts a*x+b into FMAs, the interpreted Pallas kernel rounds each
    # step); where the winner AGREES the depths must match to ulps, and
    # where it flips the depths were tied to ulps anyway
    agree = vis_t == vis_s
    assert agree.mean() > 0.97
    dt, ds_ = np.asarray(fb_t.depth), np.asarray(fb_s.depth)
    # measured: worst agreed-winner divergence ~2e-5 relative (~7e-7
    # absolute), a few dozen px, from FMA-contraction differences through
    # the edge/depth-plane chain (kernel vs XLA compilations)
    np.testing.assert_allclose(dt[agree], ds_[agree], rtol=3e-5, atol=1e-6)
    if (~agree).any():
        np.testing.assert_allclose(dt[~agree], ds_[~agree], rtol=1e-4)


def test_first_frame_renders_geometry(tiny_scene):
    image, fb, state, stats = render(tiny_scene)
    image = np.asarray(image)
    depth = np.asarray(fb.depth)
    vis = np.asarray(fb.vis)

    covered = vis != INVALID_FRAG
    assert covered.sum() > 500  # kittens on screen
    assert np.isfinite(image).all()
    # depth populated exactly where fragments are
    assert (depth[covered] > 0).all()
    assert (depth[~covered] == 0).all()
    # shaded pixels are brighter than the black background
    assert image[covered].mean() > 0.05
    assert np.abs(image[~covered]).max() < 0.01  # only deband noise
    # stats flow: first frame emits everything in the late pass
    assert int(stats.late_commands) > 0
    assert int(stats.visible_draws) > 0
    assert int(stats.early_clusters) == 0  # dvb starts all-invisible


def test_second_frame_temporal_stability(tiny_scene):
    image1, fb1, state1, stats1 = render(tiny_scene)
    # same camera: second frame should produce the same image via the
    # early-pass path (previous visibility) + late pass adds nothing new
    image2, fb2, state2, stats2 = render(tiny_scene, state=state1)
    np.testing.assert_allclose(np.asarray(fb1.depth), np.asarray(fb2.depth), atol=1e-6)
    assert int(stats2.early_clusters) > 0
    # visibility state converged
    np.testing.assert_array_equal(np.asarray(state1.draw_vis), np.asarray(state2.draw_vis))
    np.testing.assert_array_equal(np.asarray(state1.vis_words), np.asarray(state2.vis_words))


def test_frame_with_culling_disabled(tiny_scene):
    image, fb, state, stats = render(tiny_scene, settings=RenderSettings(culling=False, occlusion=False))
    vis = np.asarray(fb.vis)
    assert (vis != INVALID_FRAG).sum() > 500


def test_offscreen_draws_are_culled(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=4)
    draws.position[:] = np.array([[0.0, 0.0, 50.0]])  # behind the camera
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], dtype=np.float32)
    ds = scene_mod.upload(kitten_geometry, draws)
    image, fb, state, stats = render(ds)
    assert (np.asarray(fb.vis) == INVALID_FRAG).all()
    assert int(stats.visible_draws) == 0


def test_occlusion_culls_hidden_draws(kitten_geometry):
    """A kitten fully hidden behind a much larger kitten should be culled by
    the two-pass occlusion protocol from the second frame on."""
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=2)
    # draw 0: big kitten near the camera; draw 1: small kitten far behind it
    draws.position[0] = [0.0, -0.5, -2.0]
    draws.scale[0] = 3.0
    draws.position[1] = [0.0, 0.0, -20.0]
    draws.scale[1] = 0.5
    draws.orientation[:] = np.array([0, 0, 0, 1], dtype=np.float32)
    ds = scene_mod.upload(kitten_geometry, draws)

    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    out = None
    for _ in range(3):
        out = render(ds, state=state)
        state = out[2]
    _, fb, state, stats = out
    draw_vis = np.asarray(state.draw_vis)
    assert draw_vis[0] == 1
    assert draw_vis[1] == 0  # occluded


def test_post_pass_renders_alpha_class(kitten_geometry):
    """Draws classified postPass=1 are culled+rendered by the extra pass."""
    import dataclasses

    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=4)
    draws.position[:] = np.array([[0.0, 0.0, -3.0]]) + np.array([[1.2, 0.0, 0.0]]) * (
        np.arange(4)[:, None] - 1.5
    )
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], dtype=np.float32)
    draws.post_pass[:] = [0, 1, 0, 1]
    ds = scene_mod.upload(kitten_geometry, draws)

    cfg2 = dataclasses.replace(CFG, post_passes=2)
    cfg1 = CFG

    image2, fb2, state2, stats2 = render(ds, cfg=cfg2)
    image1, fb1, state1, stats1 = render(ds, cfg=cfg1)

    c2 = int((np.asarray(fb2.vis) != INVALID_FRAG).sum())
    c1 = int((np.asarray(fb1.vis) != INVALID_FRAG).sum())
    # the post pass adds the two alpha-class kittens
    assert c2 > c1 * 1.5
    # and marks them visible in the carried state
    assert np.asarray(state2.draw_vis).sum() == 4
    assert np.asarray(state1.draw_vis).sum() == 2
