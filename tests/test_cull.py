from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import cull, cullmath, pyramid
from niagara_tpu.render.camera import Camera, RenderSettings, make_cull_params
from niagara_tpu.utils import math3d

# The library functions are designed to run inside one jitted frame program;
# eager per-op dispatch is slow, so tests jit them at the call boundary.
draw_cull_j = partial(jax.jit, static_argnames=("late", "pyramid_shape"))(cull.draw_cull)
build_task_commands_j = partial(jax.jit, static_argnames=("max_groups", "capacity"))(cull.build_task_commands)
cluster_cull_j = partial(jax.jit, static_argnames=("late", "pyramid_shape", "cluster_capacity"))(cull.cluster_cull)
build_pyramid_j = partial(jax.jit, static_argnames=("levels", "ph", "pw"))(pyramid.build_pyramid)


# ---------------------------------------------------------------- oracles


def project_sphere_oracle(c, r, znear, p00, p11):
    """Scalar transcription of reference shaders/math.h:1-22."""
    if c[2] < r + znear:
        return None
    cr = c * r
    czr2 = c[2] * c[2] - r * r
    vx = np.sqrt(c[0] * c[0] + czr2)
    minx = (vx * c[0] - cr[2]) / (vx * c[2] + cr[0])
    maxx = (vx * c[0] + cr[2]) / (vx * c[2] - cr[0])
    vy = np.sqrt(c[1] * c[1] + czr2)
    miny = (vy * c[1] - cr[2]) / (vy * c[2] + cr[1])
    maxy = (vy * c[1] + cr[2]) / (vy * c[2] - cr[1])
    aabb = np.array([minx * p00, miny * p11, maxx * p00, maxy * p11])
    aabb = aabb[[0, 3, 2, 1]] * np.array([0.5, -0.5, 0.5, -0.5]) + 0.5
    return aabb


def occlusion_mip_oracle(aabb, pw, ph):
    """Scalar transcription of reference shaders/math.h:24-39."""
    size = aabb[2:] - aabb[:2]
    level = np.ceil(np.log2(max(size[0] * pw, size[1] * ph)))
    fmip = np.array([pw, ph]) * 2.0 ** (1 - level)
    frac = aabb[:2] * fmip - np.floor(aabb[:2] * fmip)
    if np.all(frac + size * fmip <= 2.0):
        level -= 1
    return max(level, 0.0)


# ---------------------------------------------------------------- unit tests


def test_project_sphere_matches_oracle(rng):
    znear, p00, p11 = 0.1, 0.8, 1.4
    c = np.stack(
        [rng.uniform(-5, 5, 300), rng.uniform(-5, 5, 300), rng.uniform(0.0, 20, 300)], axis=-1
    ).astype(np.float32)
    r = rng.uniform(0.01, 2, 300).astype(np.float32)
    ps_j = jax.jit(partial(cullmath.project_sphere, znear=znear, p00=p00, p11=p11))
    valid, aabb = map(np.asarray, ps_j(jnp.array(c), jnp.array(r)))
    n = 0
    for i in range(300):
        oracle = project_sphere_oracle(c[i], r[i], znear, p00, p11)
        if oracle is None:
            assert not valid[i]
        else:
            assert valid[i]
            np.testing.assert_allclose(aabb[i], oracle, rtol=1e-4, atol=1e-5)
            n += 1
    assert n > 50  # make sure the test exercises the valid branch


def test_occlusion_mip_matches_oracle(rng):
    pw, ph = 1024.0, 512.0
    lo = rng.uniform(0, 0.9, size=(300, 2))
    size = rng.uniform(1e-4, 0.5, size=(300, 2))
    aabb = np.concatenate([lo, lo + size], axis=-1).astype(np.float32)
    got = np.asarray(jax.jit(cullmath.occlusion_mip, static_argnums=(1, 2))(jnp.array(aabb), pw, ph))
    for i in range(300):
        assert got[i] == pytest.approx(occlusion_mip_oracle(aabb[i], pw, ph))


def test_frustum_visible():
    cam = Camera()
    settings = RenderSettings()
    params, _ = make_cull_params(cam, 1920, 1080, 1024, 512, settings)
    # directly in front: visible
    assert bool(cullmath.frustum_visible(jnp.array([0.0, 0, 10]), jnp.array(1.0), params.frustum, params.znear, params.zfar))
    # behind camera
    assert not bool(cullmath.frustum_visible(jnp.array([0.0, 0, -10]), jnp.array(1.0), params.frustum, params.znear, params.zfar))
    # far to the left, beyond the frustum slope
    assert not bool(cullmath.frustum_visible(jnp.array([-100.0, 0, 10]), jnp.array(1.0), params.frustum, params.znear, params.zfar))
    # past the draw distance
    assert not bool(cullmath.frustum_visible(jnp.array([0.0, 0, 500]), jnp.array(1.0), params.frustum, params.znear, params.zfar))


def test_cone_cull():
    # meshlet at z=10 with cone facing away from the camera (axis +z) and a
    # tight cutoff must be culled; facing the camera must not
    center = jnp.array([0.0, 0.0, 10.0])
    assert bool(cullmath.cone_cull(center, 0.1, jnp.array([0.0, 0, 1]), 0.5, jnp.zeros(3)))
    assert not bool(cullmath.cone_cull(center, 0.1, jnp.array([0.0, 0, -1]), 0.5, jnp.zeros(3)))
    # cutoff 1.0 disables culling regardless of orientation
    assert not bool(cullmath.cone_cull(center, 0.1, jnp.array([0.0, 0, 1]), 1.0, jnp.zeros(3)))


# ------------------------------------------------------------ pyramid tests


def footprint_filter(mip):
    """The atlas stores min over the clamped 2x2 footprint of each texel."""
    right = np.concatenate([mip[:, 1:], mip[:, -1:]], axis=1)
    down = np.concatenate([mip[1:, :], mip[-1:, :]], axis=0)
    dr = np.concatenate([right[1:, :], right[-1:, :]], axis=0)
    return np.minimum(np.minimum(mip, right), np.minimum(down, dr))


def test_pyramid_min_reduce_pow2(rng):
    depth = rng.uniform(size=(64, 128)).astype(np.float32)
    levels, ph, pw = pyramid.pyramid_shape(128, 64)
    assert (pw, ph) == (64, 32)
    atlas = np.asarray(build_pyramid_j(jnp.array(depth), levels, ph, pw))
    # mip0 64x32: footprint for exact-halving = 2x2 blocks, then the stored
    # texels are footprint-filtered (see build_pyramid docstring)
    mip0 = depth.reshape(32, 2, 64, 2).min(axis=(1, 3))
    np.testing.assert_allclose(atlas[0, :32, :64], footprint_filter(mip0))
    mip1 = mip0.reshape(16, 2, 32, 2).min(axis=(1, 3))
    np.testing.assert_allclose(atlas[1, :16, :32], footprint_filter(mip1))
    # top mip is the global min
    top = atlas[levels - 1, 0, 0]
    assert top == pytest.approx(depth.min())


def test_pyramid_conservative_nonpow2(rng):
    """Non-pow2 screens: every pyramid texel must be <= the min of the screen
    region it covers (conservative for reverse-Z occlusion)."""
    depth = rng.uniform(size=(37, 85)).astype(np.float32)
    levels, ph, pw = pyramid.pyramid_shape(85, 37)
    atlas = np.asarray(build_pyramid_j(jnp.array(depth), levels, ph, pw))
    m0 = atlas[0, :ph, :pw]
    # stored texel (x,y) must be <= the min of the screen footprint of texels
    # (x..x+1, y..y+1) -> conservative for reverse-Z occlusion
    for y in range(0, ph, 7):
        for x in range(0, pw, 13):
            fx = (x + 0.5) / pw * 85 - 0.5
            fy = (y + 0.5) / ph * 37 - 0.5
            x0, y0 = int(np.floor(fx)), int(np.floor(fy))
            vals = [
                depth[min(max(yy, 0), 36), min(max(xx, 0), 84)]
                for yy in (y0, y0 + 1)
                for xx in (x0, x0 + 1)
            ]
            assert m0[y, x] <= min(vals) + 1e-6


def test_sample_pyramid_min_matches_gather(rng):
    depth = rng.uniform(size=(64, 64)).astype(np.float32)
    levels, ph, pw = pyramid.pyramid_shape(64, 64)
    atlas = build_pyramid_j(jnp.array(depth), levels, ph, pw)
    uv = jnp.array([[0.5, 0.5], [0.1, 0.9], [0.99, 0.01]])
    lv = jnp.array([0.0, 1.0, 3.0])
    got = np.asarray(jax.jit(cullmath.sample_pyramid_min, static_argnums=(3, 4))(atlas, uv, lv, pw, ph))
    a = np.asarray(atlas)
    for i in range(3):
        l = int(lv[i])
        mw, mh = pw >> l, ph >> l
        tx = float(uv[i, 0]) * mw - 0.5
        ty = float(uv[i, 1]) * mh - 0.5
        x0 = min(max(int(np.floor(tx)), 0), mw - 1)
        y0 = min(max(int(np.floor(ty)), 0), mh - 1)
        # filtered atlas: a single fetch of the footprint's top-left texel
        assert got[i] == pytest.approx(a[l, y0, x0])


# ------------------------------------------------------------- cascade tests


@pytest.fixture(scope="module")
def small_scene(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=512)
    return scene_mod.upload(kitten_geometry, draws)


def _params(settings=None):
    cam = Camera()
    settings = settings or RenderSettings()
    return make_cull_params(cam, 256, 256, 128, 128, settings)[0]


def test_draw_cull_matches_oracle(small_scene, kitten_geometry):
    ds = small_scene
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    draw_vis = jnp.ones(ds.num_draws, dtype=jnp.int32)

    emit, lod_index, visible = draw_cull_j(
        ds, params, draw_vis, atlas, late=False, pyramid_shape=(ph, pw)
    )
    emit, lod_index, visible = map(np.asarray, (emit, lod_index, visible))

    view = np.asarray(params.view)
    g = kitten_geometry
    for d in range(0, ds.num_draws, 17):
        mi = ds.draw_mesh_index[d]
        c = math3d.rotate_quat(g.meshes.center[mi], ds.draw_orientation[d]) * ds.draw_scale[d] + ds.draw_position[d]
        c = (view[:3, :3] @ c + view[:3, 3]).astype(np.float32)
        r = g.meshes.radius[mi] * ds.draw_scale[d]
        fr = np.asarray(params.frustum)
        vis = c[2] * fr[1] - abs(c[0]) * fr[0] > -r
        vis &= c[2] * fr[3] - abs(c[1]) * fr[2] > -r
        vis &= (c[2] + r > params.znear) and (c[2] - r < params.zfar)
        assert visible[d] == vis, d
        assert emit[d] == vis  # early pass with all dvb==1

        if vis:
            dist = max(np.linalg.norm(c) - r, 0.0)
            threshold = dist * float(params.lod_target) / ds.draw_scale[d]
            expect_lod = 0
            for i in range(1, g.meshes.lod_count[mi]):
                if g.meshes.lod_error[mi, i] < threshold:
                    expect_lod = i
            assert lod_index[d] == expect_lod, d


def test_draw_cull_culling_disabled(small_scene):
    ds = small_scene
    params = _params(RenderSettings(culling=False))
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    emit, _, visible = draw_cull_j(
        ds, params, jnp.ones(ds.num_draws, dtype=jnp.int32), atlas, late=False, pyramid_shape=(ph, pw)
    )
    assert np.asarray(visible).all()


def test_early_pass_respects_draw_visibility(small_scene):
    ds = small_scene
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    dvb = jnp.zeros(ds.num_draws, dtype=jnp.int32).at[::3].set(1)
    emit, _, _ = draw_cull_j(ds, params, dvb, atlas, late=False, pyramid_shape=(ph, pw))
    emit = np.asarray(emit)
    assert not emit[np.asarray(dvb) == 0].any()


def test_build_task_commands(small_scene, kitten_geometry):
    ds = small_scene
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    draw_vis = jnp.ones(ds.num_draws, dtype=jnp.int32)
    emit, lod_index, _ = draw_cull_j(ds, params, draw_vis, atlas, late=False, pyramid_shape=(ph, pw))

    max_groups = int(np.ceil(kitten_geometry.meshes.lod_meshlet_count.max() / 64))
    cmds = build_task_commands_j(ds, emit, lod_index, draw_vis, max_groups=max_groups, capacity=4096)

    emit_np = np.asarray(emit)
    lod_np = np.asarray(lod_index)
    count = int(cmds.count)

    # oracle emission in draw order
    expected = []
    for d in np.nonzero(emit_np)[0]:
        mi = ds.draw_mesh_index[d]
        mc = int(ds.lod_meshlet_count[mi, lod_np[d]])
        mo = int(ds.lod_meshlet_offset[mi, lod_np[d]])
        groups = (mc + 63) // 64
        for g in range(groups):
            expected.append((int(d), mo + g * 64, min(64, mc - g * 64)))
    assert count == len(expected)
    got = list(
        zip(
            np.asarray(cmds.draw_id)[:count].tolist(),
            np.asarray(cmds.task_offset)[:count].tolist(),
            np.asarray(cmds.task_count)[:count].tolist(),
        )
    )
    assert got == expected
    # slots past count are empty
    assert np.asarray(cmds.task_count)[count:].max(initial=0) == 0


def test_task_command_overflow_drops_whole_draws(small_scene):
    ds = small_scene
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    draw_vis = jnp.ones(ds.num_draws, dtype=jnp.int32)
    emit, lod_index, _ = draw_cull_j(ds, params, draw_vis, atlas, late=False, pyramid_shape=(ph, pw))

    cmds_small = build_task_commands_j(ds, emit, lod_index, draw_vis, max_groups=8, capacity=16)
    count = int(cmds_small.count)
    assert count <= 16
    # all retained commands have valid task counts
    tc = np.asarray(cmds_small.task_count)[:count]
    assert (tc > 0).all() and (tc <= 64).all()


def test_cluster_cull_early_matches_oracle(small_scene, kitten_geometry):
    ds = small_scene
    params = _params()
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    draw_vis = jnp.ones(ds.num_draws, dtype=jnp.int32)
    emit, lod_index, _ = draw_cull_j(ds, params, draw_vis, atlas, late=False, pyramid_shape=(ph, pw))
    cmds = build_task_commands_j(ds, emit, lod_index, draw_vis, max_groups=8, capacity=4096)

    vis_words = jnp.full(((ds.meshlet_visibility_count + 31) // 32,), 0xFFFFFFFF, dtype=jnp.uint32)
    ccmd, clane, ccount, _, _ = cluster_cull_j(
        ds, params, cmds, vis_words, atlas, late=False, pyramid_shape=(ph, pw), cluster_capacity=1 << 16
    )
    count = int(ccount)
    assert count > 0

    # oracle: recompute visibility for a sample of emitted clusters
    view = np.asarray(params.view)
    fr = np.asarray(params.frustum)
    ccmd, clane = np.asarray(ccmd), np.asarray(clane)
    cmd_draw = np.asarray(cmds.draw_id)
    cmd_off = np.asarray(cmds.task_offset)
    for k in range(0, count, max(count // 64, 1)):
        c, lane = ccmd[k], clane[k]
        d = cmd_draw[c]
        mi = cmd_off[c] + lane
        center = (
            math3d.rotate_quat(np.asarray(ds.meshlet_center[mi]), ds.draw_orientation[d]) * ds.draw_scale[d]
            + ds.draw_position[d]
        )
        center = view[:3, :3] @ center + view[:3, 3]
        r = ds.meshlet_radius[mi] * ds.draw_scale[d]
        vis = center[2] * fr[1] - abs(center[0]) * fr[0] > -r
        vis &= center[2] * fr[3] - abs(center[1]) * fr[2] > -r
        vis = vis and (center[2] + r > params.znear) and (center[2] - r < params.zfar)
        assert vis, f"cluster {k} (cmd {c} lane {lane}) should be visible"

    # total emitted meshlets <= total meshlets addressed by the commands
    assert count <= int(np.asarray(cmds.task_count).sum())


def test_visibility_word_update(small_scene):
    """Late pass rewrites the visibility words of processed meshlets only."""
    ds = small_scene
    params = _params(RenderSettings(occlusion=True))
    levels, ph, pw = pyramid.pyramid_shape(256, 256)
    # empty depth pyramid (all 0 = far): nothing is occluded since
    # depthSphere > 0 for all spheres in front
    atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    draw_vis = jnp.ones(ds.num_draws, dtype=jnp.int32)
    emit, lod_index, _ = draw_cull_j(ds, params, draw_vis, atlas, late=True, pyramid_shape=(ph, pw))
    cmds = build_task_commands_j(ds, emit, lod_index, draw_vis, max_groups=8, capacity=4096)

    n_words = (ds.meshlet_visibility_count + 31) // 32
    vis_words = jnp.zeros(n_words, dtype=jnp.uint32)
    _, _, ccount, new_words, _ = cluster_cull_j(
        ds, params, cmds, vis_words, atlas, late=True, pyramid_shape=(ph, pw), cluster_capacity=1 << 16
    )
    new_words = np.asarray(new_words)
    # with zero prior visibility and late pass, emitted cluster count must
    # equal the number of set bits after update (all newly visible)
    set_bits = int(np.unpackbits(new_words.view(np.uint8)).sum())
    assert set_bits == int(ccount)


def test_vis_offsets_are_64_aligned(small_scene):
    assert np.all(np.asarray(small_scene.draw_vis_offset) % 64 == 0)
