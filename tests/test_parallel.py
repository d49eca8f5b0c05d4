import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.parallel import mesh as pmesh
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.ops.raster import INVALID_FRAG

CFG = frame_mod.FrameConfig(
    width=128, height=64, max_groups=8,
    cmd_capacity=256, cluster_capacity=512,
    small_capacity=1 << 12, big_capacity=64,
    pair_capacity=1 << 12, tri_capacity=1 << 12,
    raster_interpret=True, bloom=False,
)


@pytest.fixture(scope="module")
def small_draws(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=16)
    draws.position[:] = np.array([[0.0, 0.0, -4.0]]) + np.array([[0.5, 0.0, 0.0]]) * (
        np.arange(16)[:, None] - 7.5
    )
    draws.scale[:] = 0.8
    draws.orientation[:] = np.array([0, 0, 0, 1], dtype=np.float32)
    return draws


def test_sharded_frame_runs_and_covers(kitten_geometry, small_draws):
    n_dev = min(len(jax.devices()), 8)
    assert n_dev >= 2, "conftest requests 8 virtual CPU devices"

    m = pmesh.make_mesh(n_dev)
    stacked = pmesh.shard_draws(kitten_geometry, small_draws, n_dev)
    state = pmesh.init_sharded_state(stacked, n_dev)
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), CFG)

    frame_fn = pmesh.make_sharded_frame(m, CFG)
    with m:
        image, new_state, stats = frame_fn(stacked, state, params, sp)
    image = np.asarray(image)
    assert image.shape == (64, 128, 3)
    assert np.isfinite(image).all()
    assert (image.sum(-1) > 0.05).sum() > 100  # kittens visible
    assert int(stats.visible_draws) > 0


def test_sharded_matches_single_chip_coverage(kitten_geometry, small_draws):
    """The multi-chip composite must light up the same pixels as the
    single-chip render (depths may differ at ulp level)."""
    n_dev = min(len(jax.devices()), 4)

    # single chip
    ds = scene_mod.upload(kitten_geometry, small_draws)
    st = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), CFG)
    img1, fb1, _, _ = frame_mod.render_frame(ds, st, params, sp, CFG)
    covered1 = np.asarray(fb1.vis) != INVALID_FRAG

    # sharded
    m = pmesh.make_mesh(n_dev)
    stacked = pmesh.shard_draws(kitten_geometry, small_draws, n_dev)
    state = pmesh.init_sharded_state(stacked, n_dev)
    frame_fn = pmesh.make_sharded_frame(m, CFG)
    with m:
        imageN, _, _ = frame_fn(stacked, state, params, sp)
    coveredN = np.asarray(imageN).sum(-1) > 1e-3

    agree = (coveredN == covered1).mean()
    assert agree > 0.99, agree
