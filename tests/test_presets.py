"""Config presets: the staged benchmark configs must mean what they say.

Key contract (reference niagara.cpp culling toggles are image-invariant):
adding occlusion culling (config 1 -> 2) must not change the depth image —
it only removes geometry that lost the depth test anyway.  Config 0
(no culling, LOD 0 everywhere) renders different GEOMETRY by design (LOD
off), so its contract is full coverage with zero capacity drops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render import presets
from niagara_tpu.render.camera import Camera, RenderSettings


def _render(ds, config, frames=2):
    # config 0 renders EVERY draw at LOD 0: capacities must hold candidate
    # clusters (16 draws x 452 LOD-0 meshlets) and their visible triangles
    # — cluster_cull_direct bounds candidates like the reference's
    # TASK_WGLIMIT, dropping draws whole past the budget
    cfg = frame_mod.FrameConfig(
        width=256, height=128, max_groups=8,
        cmd_capacity=1 << 12, cluster_capacity=1 << 13,
        pair_capacity=1 << 17, tri_capacity=1 << 17,
        small_capacity=1 << 17, big_capacity=64,
        bloom=False, raster_interpret=True,
        **presets.frame_overrides(config),
    )
    settings = presets.settings_for(config)
    params, sp = frame_mod.make_frame_inputs(Camera(), settings, cfg)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    stats = None
    for _ in range(frames):  # converge two-pass visibility state
        image, fb, state, stats = frame_mod.render_frame(ds, state, params, sp, cfg)
    assert int(stats.cmd_dropped) == 0 and int(stats.cluster_dropped) == 0
    assert int(stats.tri_dropped) == 0 and int(stats.pair_dropped) == 0
    return np.asarray(fb.depth)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    # small mesh + tight scene radius: config 0 renders EVERYTHING at LOD 0,
    # so the triangle volume must stay interpret-mode friendly
    from niagara_tpu.cooker import cook

    path = tmp_path_factory.mktemp("presets") / "blob.obj"
    lines = []
    n = 9
    for j in range(n):
        for i in range(n):
            th = np.pi * (j + 0.5) / n
            ph = 2 * np.pi * i / n
            lines.append(f"v {np.sin(th)*np.cos(ph):.5f} {np.cos(th):.5f} {np.sin(th)*np.sin(ph):.5f}")
    for j in range(n - 1):
        for i in range(n):
            a = j * n + i + 1
            b = j * n + (i + 1) % n + 1
            c, d = a + n, b + n
            lines.append(f"f {a} {b} {c}")
            lines.append(f"f {b} {d} {c}")
    path.write_text("\n".join(lines) + "\n")
    g = cook.cook_obj_meshes([str(path)])
    draws = synthesize_draws(g.meshes.count, draw_count=16, scene_radius=12.0)
    return scene_mod.upload(g, draws)


def test_config0_disables_every_cull():
    s = presets.settings_for(0)
    assert not (s.culling or s.lod or s.occlusion or s.cluster_occlusion or s.cluster_backface)
    assert presets.frame_overrides(0)["occlusion_two_pass"] is False


def test_config0_renders_everything_without_drops(ds):
    # no-culling path: every draw at LOD 0, zero capacity drops (asserted
    # inside _render), real coverage
    d0 = _render(ds, 0)
    assert (d0 > 0).sum() > 500


def test_occlusion_configs_depth_identical(ds):
    """Config 1 (frustum/cone/LOD, no occlusion) and config 2 (+ two-pass
    occlusion culling) must converge to the SAME depth image — occlusion
    culling only removes geometry that lost the depth test anyway (the
    reference's toggles are image-invariant, niagara.cpp:332-409)."""
    d1 = _render(ds, 1)
    d2 = _render(ds, 2)
    assert (d1 > 0).sum() > 500
    np.testing.assert_array_equal(d1, d2)
