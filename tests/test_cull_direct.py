"""cluster_cull_direct == build_task_commands + cluster_cull, bit-exactly.

The direct path expands emitted draws straight to a flat cluster list and
culls at [K] scale (ops/cull.py cluster_cull_direct); the legacy path goes
through 64-lane task commands (the reference's wavefront shape).  Both must
produce the IDENTICAL cluster sequence (draw-major, meshlet-ordinal), the
identical visibility-word write-back, and matching counts — across the
early pass, the late pass, and a subsequent early pass that consumes the
late pass's visibility bits.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import cull, pyramid
from niagara_tpu.render.camera import Camera, RenderSettings, make_cull_params

draw_cull_j = partial(jax.jit, static_argnames=("late", "pyramid_shape"))(cull.draw_cull)
btc_j = partial(jax.jit, static_argnames=("max_groups", "capacity"))(cull.build_task_commands)
cc_j = partial(jax.jit, static_argnames=("late", "pyramid_shape", "cluster_capacity"))(cull.cluster_cull)
ccd_j = partial(
    jax.jit,
    static_argnames=("late", "pyramid_shape", "draw_capacity", "cluster_capacity"),
)(cull.cluster_cull_direct)

CMD_CAP = 4096
K_CAP = 16384


@pytest.fixture(scope="module")
def ds(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=512)
    return scene_mod.upload(kitten_geometry, draws)


def _params(post_pass=0):
    cam = Camera()
    s = RenderSettings()
    p = make_cull_params(cam, 256, 256, 128, 128, s)[0]
    return p.replace(post_pass=jnp.int32(post_pass)) if hasattr(p, "replace") else p


def _legacy(ds, params, emit, lod, dvb, words, atlas, late, pyr_hw, max_groups):
    cmds = btc_j(ds, emit, lod, dvb, max_groups=max_groups, capacity=CMD_CAP)
    ccmd, clane, n, new_words, drop = cc_j(
        ds, params, cmds, words, atlas,
        late=late, pyramid_shape=pyr_hw, cluster_capacity=K_CAP,
    )
    n = int(n)
    draw = np.asarray(cmds.draw_id)[np.asarray(ccmd)][:n]
    mi = (np.asarray(cmds.task_offset)[np.asarray(ccmd)] + np.asarray(clane))[:n]
    return draw, mi, n, np.asarray(new_words)


def _direct(ds, params, emit, lod, dvb, words, atlas, late, pyr_hw):
    cdraw, cmi, n, new_words, n_draws, ddrop, cdrop = ccd_j(
        ds, params, emit, lod, dvb, words, atlas,
        late=late, pyramid_shape=pyr_hw,
        draw_capacity=CMD_CAP, cluster_capacity=K_CAP,
    )
    n = int(n)
    return np.asarray(cdraw)[:n], np.asarray(cmi)[:n], n, np.asarray(new_words)


def test_direct_matches_legacy_two_pass(ds, kitten_geometry):
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    pyr_hw = (ph, pw)
    dvb = jnp.ones(ds.num_draws, dtype=jnp.int32)
    max_groups = int(np.ceil(kitten_geometry.meshes.lod_meshlet_count.max() / 64))
    words0 = jnp.full(
        (max(ds.meshlet_visibility_count, 64) + 31) // 32 + 2, 0xFFFFFFFF, dtype=jnp.uint32
    )

    emit, lod, vis = draw_cull_j(ds, params, dvb, atlas, late=False, pyramid_shape=pyr_hw)

    # early pass
    dl, ml, nl, _ = _legacy(ds, params, emit, lod, dvb, words0, atlas, False, pyr_hw, max_groups)
    dd, md, nd, _ = _direct(ds, params, emit, lod, dvb, words0, atlas, False, pyr_hw)
    assert nl == nd and nl > 0
    np.testing.assert_array_equal(dl, dd)
    np.testing.assert_array_equal(ml, md)

    # late pass: same inputs, occlusion atlas of zeros (keeps all) + word
    # write-back must match bit-for-bit
    emit_l, lod_l, _ = draw_cull_j(ds, params, dvb, atlas, late=True, pyramid_shape=pyr_hw)
    dl, ml, nl, wl = _legacy(ds, params, emit_l, lod_l, vis, words0, atlas, True, pyr_hw, max_groups)
    dd, md, nd, wd = _direct(ds, params, emit_l, lod_l, vis, words0, atlas, True, pyr_hw)
    assert nl == nd
    np.testing.assert_array_equal(dl, dd)
    np.testing.assert_array_equal(ml, md)
    np.testing.assert_array_equal(wl, wd)

    # next-frame early pass consuming the written visibility bits
    dl, ml, nl, _ = _legacy(ds, params, emit, lod, dvb, jnp.asarray(wl), atlas, False, pyr_hw, max_groups)
    dd, md, nd, _ = _direct(ds, params, emit, lod, dvb, jnp.asarray(wd), atlas, False, pyr_hw)
    assert nl == nd
    np.testing.assert_array_equal(dl, dd)
    np.testing.assert_array_equal(ml, md)


def test_direct_matches_legacy_sparse_visibility(ds, kitten_geometry):
    """Mixed visibility bits exercise the early-skip protocol."""
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    pyr_hw = (ph, pw)
    dvb = jnp.ones(ds.num_draws, dtype=jnp.int32)
    max_groups = int(np.ceil(kitten_geometry.meshes.lod_meshlet_count.max() / 64))
    rng = np.random.default_rng(3)
    W = (max(ds.meshlet_visibility_count, 64) + 31) // 32 + 2
    words = jnp.asarray(rng.integers(0, 1 << 32, W, dtype=np.uint32))

    emit, lod, _ = draw_cull_j(ds, params, dvb, atlas, late=False, pyramid_shape=pyr_hw)
    dl, ml, nl, _ = _legacy(ds, params, emit, lod, dvb, words, atlas, False, pyr_hw, max_groups)
    dd, md, nd, _ = _direct(ds, params, emit, lod, dvb, words, atlas, False, pyr_hw)
    assert nl == nd
    np.testing.assert_array_equal(dl, dd)
    np.testing.assert_array_equal(ml, md)
