"""Fused Pallas setup kernel vs the XLA compact_setup reference.

Both implement the same math (ops/raster.py compact_setup docstring); the
kernel's in-block compaction preserves the flat (cluster, tri) order, so
outputs must agree element-for-element (floats to fp tolerance: the kernel
may contract to FMAs where XLA does not)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import cull, pyramid, raster, setup_fused
from niagara_tpu.render.camera import Camera, RenderSettings, make_cull_params
from niagara_tpu.scene import upload

W, H = 256, 128
CAP = 1 << 12


@pytest.fixture(scope="module")
def pipeline(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=64)
    draws.position[:] = draws.position * 0.02
    draws.position[:, 2] = -3.0 - 0.05 * np.arange(64)
    ds = upload(kitten_geometry, draws)
    params, _ = make_cull_params(Camera(), W, H, 128, 64, RenderSettings())

    levels, ph, pw = pyramid.pyramid_shape(W, H)
    atlas = jnp.zeros((levels, ph, pw), jnp.float32)
    dvb = jnp.ones(ds.num_draws, dtype=jnp.int32)
    emit, lod, _ = cull.draw_cull(ds, params[0] if isinstance(params, tuple) else params, dvb, atlas, late=False, pyramid_shape=(ph, pw))
    p = params[0] if isinstance(params, tuple) else params
    cmds = cull.build_task_commands(ds, emit, lod, dvb, max_groups=8, capacity=1 << 10)
    words = jnp.full(-(-max(ds.meshlet_visibility_count, 64) // 64) * 2, 0xFFFFFFFF, dtype=jnp.uint32)
    ccmd, clane, ccount, _, _ = cull.cluster_cull(
        ds, p, cmds, words, atlas, late=False, pyramid_shape=(ph, pw), cluster_capacity=512
    )
    return ds, p, cmds, ccmd, clane, ccount


def test_fused_matches_xla_setup(pipeline):
    ds, params, cmds, ccmd, clane, ccount = pipeline
    assert int(ccount) > 0

    tc = raster.transform_clusters(
        ds, ccmd, clane, ccount, cmds, params.view, params.p00, params.p11, params.znear, W, H
    )
    ref = raster.compact_setup(tc, W, H, float(params.znear), CAP)

    tm = raster.transform_meta(ds, ccmd, clane, ccount, cmds)
    got = setup_fused.setup_compact(tm, params, W, H, CAP, interpret=True)

    n_ref = int(ref["count"])
    n_got = int(got["count"])
    assert n_got == n_ref and n_ref > 0

    # identical compaction order -> element-wise comparison
    np.testing.assert_array_equal(np.asarray(got["tri_k"][:n_ref]), np.asarray(ref["tri_k"][:n_ref]))
    np.testing.assert_array_equal(np.asarray(got["tri_t"][:n_ref]), np.asarray(ref["tri_t"][:n_ref]))
    for k in ("x0", "y0", "x1", "y1"):
        np.testing.assert_array_equal(np.asarray(got[k][:n_ref]), np.asarray(ref[k][:n_ref]))

    # cols 0-45 are shared; col 46 carries the flat index in the fused
    # kernel (pad in the XLA path) — already checked via tri_k/tri_t.
    # The depth-plane coefficients (9-11) are compared as evaluated depth at
    # the triangle's AABB center instead of raw values: inv_det scaling
    # amplifies rounding differences arbitrarily on sliver triangles.
    a = np.asarray(got["rec48"][:n_ref])
    b = np.asarray(ref["rec48"][:n_ref])
    # edge coefficients are cross products with cancellation: compare with
    # an absolute floor scaled by the row's coefficient magnitude (FMA vs
    # non-FMA rounding differs in the cancelled bits, not the edge geometry)
    edge_scale = np.abs(b[:, :9]).max(axis=1, keepdims=True)
    diff_e = np.abs(a[:, :9] - b[:, :9])
    assert (diff_e <= 1e-4 * np.abs(b[:, :9]) + 1e-4 * edge_scale + 1e-6).all()

    cols = list(range(12, 46))
    np.testing.assert_allclose(a[:, cols], b[:, cols], rtol=1e-4, atol=1e-4)

    cxs = 0.5 * (a[:, 12] + a[:, 14])
    # col 13 carries the record's compacted index (fragment-id baking);
    # y0 comes from the setup dict's aabb side channel
    cys = 0.5 * (np.asarray(got["y0"][:n_ref], np.float32) + a[:, 15])
    z_got = a[:, 9] * cxs + a[:, 10] * cys + a[:, 11]
    z_ref = b[:, 9] * cxs + b[:, 10] * cys + b[:, 11]
    assert np.abs(z_got - z_ref).max() < 4e-3


def test_fused_backface_flip_matches_xla(kitten_geometry):
    """post_pass=1 draws render double-sided (reference niagara.cpp:1647-1648
    cull NONE): the fused kernel and compact_setup must agree on the
    back-face records too — more records than the post=0 run, same outputs."""
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=16)
    draws.position[:] = draws.position * 0.02
    draws.position[:, 2] = -3.0 - 0.1 * np.arange(16)
    draws.post_pass[:] = 1
    ds = upload(kitten_geometry, draws)
    params, _ = make_cull_params(Camera(), W, H, 128, 64, RenderSettings())
    p = params[0] if isinstance(params, tuple) else params

    levels, ph, pw = pyramid.pyramid_shape(W, H)
    atlas = jnp.zeros((levels, ph, pw), jnp.float32)
    dvb = jnp.ones(ds.num_draws, dtype=jnp.int32)
    import dataclasses as _dc
    p1 = _dc.replace(p, post_pass=jnp.int32(1))
    emit, lod, _ = cull.draw_cull(ds, p1, dvb, atlas, late=False, pyramid_shape=(ph, pw))
    cmds = cull.build_task_commands(ds, emit, lod, dvb, max_groups=8, capacity=1 << 10)
    words = jnp.full(-(-max(ds.meshlet_visibility_count, 64) // 64) * 2, 0xFFFFFFFF, dtype=jnp.uint32)
    ccmd, clane, ccount, _, _ = cull.cluster_cull(
        ds, p1, cmds, words, atlas, late=False, pyramid_shape=(ph, pw), cluster_capacity=512
    )
    assert int(ccount) > 0

    tc = raster.transform_clusters(
        ds, ccmd, clane, ccount, cmds, p.view, p.p00, p.p11, p.znear, W, H
    )
    ref = raster.compact_setup(tc, W, H, float(p.znear), CAP)
    tm = raster.transform_meta(ds, ccmd, clane, ccount, cmds)
    got = setup_fused.setup_compact(tm, p, W, H, CAP, interpret=True)

    n = int(ref["count"])
    assert int(got["count"]) == n and n > 0
    np.testing.assert_array_equal(np.asarray(got["tri_k"][:n]), np.asarray(ref["tri_k"][:n]))
    np.testing.assert_array_equal(np.asarray(got["tri_t"][:n]), np.asarray(ref["tri_t"][:n]))

    # the double-sided run must include back-facing records: rerun with
    # post=0 on the same clusters and check it keeps strictly fewer
    tc0 = dict(tc, post_pass=jnp.zeros_like(tc["post_pass"]))
    ref0 = raster.compact_setup(tc0, W, H, float(p.znear), CAP)
    assert int(ref0["count"]) < n


def test_fused_count_respects_capacity(pipeline):
    ds, params, cmds, ccmd, clane, ccount = pipeline
    tm = raster.transform_meta(ds, ccmd, clane, ccount, cmds)
    small = setup_fused.setup_compact(tm, params, W, H, 256, interpret=True)
    assert int(small["count"]) <= 256
