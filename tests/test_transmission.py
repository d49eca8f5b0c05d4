"""Transmission draw class (postPass=2) — semantics + end-to-end.

The reference classifies draws opaque(0)/alpha-test(1)/transmission(2)
(scene.cpp:584-588) and routes classes through the post-pass loop
(niagara.cpp:1781-1788) — but never rasterizes class 2 and gives it a null
BLAS in the RT instance list (scenert.cpp:515-517: transmission neither
draws nor casts shadows).  This engine DEFINES class-2 rendering: the
transmission layer rasterizes into its own depth/visibility buffer (never
touching the opaque depth), shades like any surface, and composite blends
it 50/50 where its front-most fragment is nearer than the opaque depth
(ops/shade.composite docstring).  Shadow casting stays excluded, matching
the reference's null BLAS.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import cullmath, shade
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render.camera import Camera, RenderSettings

W, H = 256, 128


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """The 3-class interpret-mode frame is the largest program in the
    suite; XLA:CPU's executable serialization segfaults writing its
    persistent-cache entry (observed twice at this exact test).  Skip the
    cache for this module — correctness tests, compile time is acceptable."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


@pytest.fixture(scope="module")
def geometry(tmp_path_factory):
    from niagara_tpu.cooker import cook

    path = tmp_path_factory.mktemp("trans") / "blob.obj"
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
    return cook.cook_obj_meshes([str(path)])


def _scene(geometry):
    draws = synthesize_draws(geometry.meshes.count, draw_count=24, scene_radius=12.0)
    # classes 0/1/2 round-robin: opaque, alpha-tested, transmission
    draws.post_pass[:] = np.arange(24) % 3
    return scene_mod.upload(geometry, draws)


def _render(ds, post_passes, frames=2):
    cfg = frame_mod.FrameConfig(
        width=W, height=H, max_groups=8,
        cmd_capacity=1 << 10, cluster_capacity=1 << 12,
        pair_capacity=1 << 16, tri_capacity=1 << 16,
        late_cluster_capacity=1 << 12, late_tri_capacity=1 << 16,
        bloom=False, raster_interpret=True, post_passes=post_passes,
    )
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    for _ in range(frames):
        image, fb, state, stats = frame_mod.render_frame(ds, state, params, sp, cfg)
    assert int(stats.cmd_dropped) == 0 and int(stats.cluster_dropped) == 0
    assert int(stats.tri_dropped) == 0 and int(stats.pair_dropped) == 0
    return np.asarray(image), np.asarray(fb.depth), np.asarray(fb.vis)


def test_three_class_frame_end_to_end(geometry):
    """postPass=2 draws never write the opaque depth/vis but do change the
    image (the depth-tested blend)."""
    ds = _scene(geometry)
    img3, depth3, vis3 = _render(ds, post_passes=3)
    # same scene, transmission class disabled (reference behavior: class 2
    # draws exist but are never rasterized)
    img2, depth2, vis2 = _render(ds, post_passes=2)

    np.testing.assert_array_equal(depth3, depth2)
    np.testing.assert_array_equal(vis3, vis2)
    assert (depth2 > 0).sum() > 200, "scene renders real coverage"
    # the blend must have changed some pixels
    assert np.abs(img3 - img2).max() > 1e-3


def test_transmission_draws_excluded_without_pass3(geometry):
    """With post_passes=2, class-2 draws are invisible (the reference never
    rasterizes them) — their removal from the scene changes nothing."""
    ds = _scene(geometry)
    img2, depth2, _ = _render(ds, post_passes=2)

    draws = synthesize_draws(geometry.meshes.count, draw_count=24, scene_radius=12.0)
    draws.post_pass[:] = np.arange(24) % 3
    keep = draws.post_pass != 2
    from niagara_tpu.scene import Draws

    draws_k = Draws(
        position=draws.position[keep], scale=draws.scale[keep],
        orientation=draws.orientation[keep], mesh_index=draws.mesh_index[keep],
        meshlet_visibility_offset=draws.meshlet_visibility_offset[keep],
        post_pass=draws.post_pass[keep], material_index=draws.material_index[keep],
    )
    ds_k = scene_mod.upload(geometry, draws_k)
    img_k, depth_k, _ = _render(ds_k, post_passes=2)
    np.testing.assert_array_equal(depth2, depth_k)


def test_composite_blend_semantics():
    """Unit oracle for the blend: in front -> 50/50 of the two LIT colors,
    behind -> untouched, over background -> blended with black."""
    h, w = 8, 128
    depth = np.full((h, w), 0.5, np.float32)
    depth[:, :32] = 0.0  # background strip (invalid)
    valid = depth > 0.0
    g0 = np.tile(np.array([0.5, 0.3, 0.2, 0.0], np.float32), (h, w, 1))
    g1 = np.tile(np.array([0.5, 0.5, 0.4, 0.0], np.float32), (h, w, 1))
    g0t = np.tile(np.array([0.1, 0.2, 0.6, 0.0], np.float32), (h, w, 1))
    g1t = np.tile(np.array([0.3, 0.7, 0.1, 0.0], np.float32), (h, w, 1))
    # transmission: in front on cols [32,80), behind on [80,128), covering
    # the background strip too
    deptht = np.zeros((h, w), np.float32)
    deptht[:, :80] = 0.7
    deptht[:, 80:] = 0.3
    validt = np.ones((h, w), bool)

    kw = dict(
        camera_position=jnp.array([0.0, 0.0, 0.0]),
        sun_direction=jnp.array([0.0, 1.0, 0.0]),
        inverse_view_projection=jnp.eye(4),
        width=w, height=h,
    )
    base = np.asarray(shade.composite(g0, g1, depth, valid, **kw))
    out = np.asarray(shade.composite(
        g0, g1, depth, valid, transmission=(g0t, g1t, deptht, validt), **kw
    ))

    # behind the opaque surface: untouched
    np.testing.assert_array_equal(out[:, 80:], base[:, 80:])
    # in front: tonemap(0.5*lit_opaque + 0.5*lit_transmission) + deband
    lit = np.asarray(shade._lit_color(
        g0, g1, depth, shadow_term=jnp.ones((h, w)), **kw))
    litt = np.asarray(shade._lit_color(
        g0t, g1t, deptht, shadow_term=jnp.ones((h, w)), **kw))
    xy = np.stack(np.meshgrid(np.arange(w, dtype=np.float32),
                              np.arange(h, dtype=np.float32)), axis=-1)
    deband = (np.asarray(cullmath.gradient_noise(jnp.asarray(xy))) * 2.0 - 1.0)
    expect_front = np.asarray(cullmath.tonemap(
        jnp.asarray(0.5 * lit + 0.5 * litt))) + (deband * (0.5 / 255.0))[..., None]
    np.testing.assert_allclose(out[:, 32:80], expect_front[:, 32:80], atol=1e-6)
    # over background: blended with black (valid=False zeroes the base)
    expect_bg = np.asarray(cullmath.tonemap(
        jnp.asarray(0.5 * litt))) + (deband * (0.5 / 255.0))[..., None]
    np.testing.assert_allclose(out[:, :32], expect_bg[:, :32], atol=1e-6)
