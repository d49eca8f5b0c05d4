"""Reference-parity harness: GLSL-transcribed oracle vs the engine.

The reference binary cannot run in this environment (no Vulkan / lavapipe),
so parity is demonstrated against a *line-by-line numpy transcription* of the
reference's culling shaders (the harness BASELINE.md:24-28 prescribes):

  * drawcull.comp.glsl (LATE=0/1, TASK=1) -> `drawcull_oracle`
  * clustercull.comp.glsl (LATE=0/1)      -> `clustercull_oracle`

The oracle is evaluated in float32 with the same operation ORDER as the GLSL
source; every block carries a file:line citation.  The engine must then match
the oracle BIT-IDENTICALLY on per-draw / per-meshlet DECISIONS (visibility,
emission, LOD index, visibility-bit write-back) over two simulated frames of
a PCG-synthesized instance scene — including the late pass sampling a real
depth pyramid rendered by the engine itself.

Two deliberate divergences (documented engine design choices, not bugs):
  * command/cluster output ORDER: the reference appends via global atomics
    (nondeterministic); the engine uses prefix-sum compaction.  Only the
    *sets* are comparable (SURVEY.md §4).
  * meshlet-visibility bits of lanes past a draw's meshlet count: the
    reference leaves them stale (atomicOr/And per live bit), the engine
    writes whole words and zeroes dead lanes.  Dead bits are unobservable
    (every read is guarded by `mgi < taskCount`), so the comparison masks
    them.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from niagara_tpu import scene as scene_mod
from niagara_tpu.config import TASK_WGSIZE
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import cull, pyramid, raster
from niagara_tpu.render.camera import Camera, RenderSettings, make_cull_params

f32 = np.float32

draw_cull_j = partial(jax.jit, static_argnames=("late", "pyramid_shape"))(cull.draw_cull)
build_task_commands_j = partial(jax.jit, static_argnames=("max_groups", "capacity"))(cull.build_task_commands)
cluster_cull_j = partial(jax.jit, static_argnames=("late", "pyramid_shape", "cluster_capacity"))(cull.cluster_cull)
build_pyramid_j = partial(jax.jit, static_argnames=("levels", "ph", "pw"))(pyramid.build_pyramid)


# ------------------------------------------------------------ GLSL oracle


def rotate_quat_np(v, q):
    """math.h:46-49  v + 2*cross(q.xyz, cross(q.xyz, v) + q.w*v)"""
    qv = q[..., :3]
    t = np.cross(qv, v).astype(f32) + q[..., 3:4] * v
    return (v + f32(2.0) * np.cross(qv, t).astype(f32)).astype(f32)


def project_sphere_np(c, r, znear, p00, p11):
    """math.h:1-22 (vectorized; returns valid mask + aabb in uv space)"""
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    valid = cz >= r + znear  # math.h:4 `if (c.z < r + znear) return false`
    czr2 = cz * cz - r * r
    with np.errstate(invalid="ignore", divide="ignore"):
        vx = np.sqrt(np.maximum(cx * cx + czr2, 0)).astype(f32)
        minx = (vx * cx - cz * r) / (vx * cz + cx * r)
        maxx = (vx * cx + cz * r) / (vx * cz - cx * r)
        vy = np.sqrt(np.maximum(cy * cy + czr2, 0)).astype(f32)
        miny = (vy * cy - cz * r) / (vy * cz + cy * r)
        maxy = (vy * cy + cz * r) / (vy * cz - cy * r)
    # math.h:19-20 aabb.xwzy * (0.5,-0.5,0.5,-0.5) + 0.5
    aabb = np.stack(
        [
            minx * p00 * f32(0.5) + f32(0.5),
            maxy * p11 * f32(-0.5) + f32(0.5),
            maxx * p00 * f32(0.5) + f32(0.5),
            miny * p11 * f32(-0.5) + f32(0.5),
        ],
        axis=-1,
    ).astype(f32)
    return valid, aabb


def occlusion_mip_np(aabb, pw, ph):
    """math.h:24-39 incl. the free finer-mip refinement"""
    sx = (aabb[..., 2] - aabb[..., 0]) * pw
    sy = (aabb[..., 3] - aabb[..., 1]) * ph
    with np.errstate(invalid="ignore", divide="ignore"):
        level = np.ceil(np.log2(np.maximum(np.maximum(sx, sy), 1e-12))).astype(f32)
        fw = pw * np.exp2(f32(1.0) - level)
        fh = ph * np.exp2(f32(1.0) - level)
    fx = aabb[..., 0] * fw
    fy = aabb[..., 1] * fh
    fits = ((fx - np.floor(fx)) + sx / pw * fw <= 2.0) & ((fy - np.floor(fy)) + sy / ph * fh <= 2.0)
    return np.maximum(level - fits.astype(f32), f32(0.0))


def sample_pyramid_min_np(atlas, uv, level, base_w, base_h):
    """textureLod through the min-reduction sampler (resources.cpp:312-325).

    The engine's pyramid texels are pre-filtered over the 2x2 bilinear
    footprint (ops/pyramid.py), so the footprint min is the footprint's
    top-left texel — this transcribes ops/cullmath.sample_pyramid_min, the
    engine's documented sampler model.
    """
    lvl = level.astype(np.int32)
    mip_w = np.maximum(base_w >> lvl, 1).astype(f32)
    mip_h = np.maximum(base_h >> lvl, 1).astype(f32)
    x0 = np.floor(uv[..., 0] * mip_w - f32(0.5)).astype(np.int32)
    y0 = np.floor(uv[..., 1] * mip_h - f32(0.5)).astype(np.int32)
    xc = np.clip(x0, 0, np.maximum(mip_w.astype(np.int32) - 1, 0))
    yc = np.clip(y0, 0, np.maximum(mip_h.astype(np.int32) - 1, 0))
    flat = atlas.reshape(-1)
    # XLA clamps out-of-bounds gather indices (engine levels past the atlas
    # read the last element); replicate for bit parity
    idx = np.clip((lvl * base_h + yc) * base_w + xc, 0, flat.shape[0] - 1)
    return flat[idx]


def frustum_np(center, radius, prm):
    """drawcull.comp.glsl:78-84 (identical in clustercull:104-108)"""
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    fr = np.asarray(prm.frustum, f32)
    vis = cz * fr[1] - np.abs(cx) * fr[0] > -radius
    vis &= cz * fr[3] - np.abs(cy) * fr[2] > -radius
    vis &= (cz + radius > f32(prm.znear)) & (cz - radius < f32(prm.zfar))
    return vis


def occlusion_np(center, radius, prm, atlas, pyr_hw):
    """drawcull.comp.glsl:86-99 / clustercull.comp.glsl:110-123"""
    valid, aabb = project_sphere_np(center, radius, f32(prm.znear), f32(prm.p00), f32(prm.p11))
    level = occlusion_mip_np(aabb, f32(prm.pyramid_w), f32(prm.pyramid_h))
    uv = np.stack([(aabb[..., 0] + aabb[..., 2]) * f32(0.5), (aabb[..., 1] + aabb[..., 3]) * f32(0.5)], axis=-1)
    depth = sample_pyramid_min_np(atlas, uv, np.where(valid, level, 0), pyr_hw[1], pyr_hw[0])
    depth_sphere = f32(prm.znear) / (center[..., 2] - radius)
    # visible = visible && depthSphere > depth (only when projectSphere valid)
    return ~valid | (depth_sphere > depth)


def drawcull_oracle(sc: dict, prm, dvb, atlas, pyr_hw, *, late: bool):
    """drawcull.comp.glsl:54-156, vectorized over draws, TASK=1 path.

    Returns (emit, lod_index, new_dvb, commands) where commands is the SET of
    emitted MeshTaskCommand tuples (drawcull.comp.glsl:120-139)."""
    D = sc["draw_position"].shape[0]
    # :61-64 postPass early-out
    in_pass = sc["draw_post_pass"] == int(prm.post_pass)
    # :66-67 early pass processes only last-frame-visible draws
    processed = in_pass & (late | (dvb != 0))

    # :73-76 center/radius to view space
    center = rotate_quat_np(sc["mesh_center"], sc["draw_orientation"]) * sc["draw_scale"][:, None] + sc["draw_position"]
    view = np.asarray(prm.view, f32)
    center = center @ view[:3, :3].T + view[:3, 3]
    radius = sc["mesh_radius"] * sc["draw_scale"]

    visible = frustum_np(center, radius, prm)  # :78-84
    visible |= int(prm.culling_enabled) == 0  # :86
    if late and int(prm.occlusion_enabled) == 1:  # :88-101
        visible &= occlusion_np(center, radius, prm, atlas, pyr_hw)

    # :106 emission predicate (TASK_CULL == 1 build)
    emit = processed & visible & (
        (not late)
        | (int(prm.cluster_occlusion_enabled) == 1)
        | (dvb == 0)
        | (int(prm.post_pass) != 0)
    )

    # :108-118 LOD select: last i in [1, lodCount) with error < threshold
    dist = np.maximum(np.sqrt(np.sum(center * center, axis=-1)).astype(f32) - radius, 0)
    threshold = dist * f32(prm.lod_target) / sc["draw_scale"]
    idx = np.arange(sc["lod_error"].shape[1])[None, :]
    passes = (sc["lod_error"] < threshold[:, None]) & (idx < sc["lod_count"][:, None]) & (idx > 0)
    lod = np.max(np.where(passes, idx, 0), axis=1)
    if int(prm.lod_enabled) != 1:
        lod = np.zeros(D, np.int64)

    # :122-139 task command emission (set semantics; atomic order is
    # nondeterministic in the reference)
    commands = set()
    for di in np.nonzero(emit)[0]:
        mc = int(sc["lod_meshlet_count"][di, lod[di]])
        mo = int(sc["lod_meshlet_offset"][di, lod[di]])
        groups = (mc + TASK_WGSIZE - 1) // TASK_WGSIZE
        for i in range(groups):
            commands.add(
                (
                    int(di),
                    mo + i * TASK_WGSIZE,
                    min(TASK_WGSIZE, mc - i * TASK_WGSIZE),
                    int(dvb[di]),
                    int(sc["draw_vis_offset"][di]) + i * TASK_WGSIZE,
                )
            )

    # :154-155 visibility write-back (late pass; skipped threads keep state)
    new_dvb = np.where(late & in_pass, visible.astype(np.int32), dvb)
    return emit, lod, new_dvb, commands


def clustercull_oracle(sc: dict, prm, commands, mvb_words, atlas, pyr_hw, *, late: bool):
    """clustercull.comp.glsl:57-141 vectorized over (command, lane).

    `commands` is the oracle command set; returns (visible_set of
    (draw_id, meshlet_index), new mvb words, live-bit mask words)."""
    if not commands:
        return set(), mvb_words.copy(), np.zeros_like(mvb_words)
    cmds = sorted(commands)
    draw_id = np.array([c[0] for c in cmds])
    task_offset = np.array([c[1] for c in cmds])
    task_count = np.array([c[2] for c in cmds])
    late_vis = np.array([c[3] for c in cmds])
    vis_offset = np.array([c[4] for c in cmds])

    mgi = np.arange(TASK_WGSIZE)[None, :]
    mi = task_offset[:, None] + mgi  # :67
    mvi = vis_offset[:, None] + mgi  # :68
    # lanes past taskCount still fetch bounds in the reference (results
    # discarded by the `valid` gate); clamp the table read like the engine
    mi_c = np.minimum(mi, sc["meshlet_center"].shape[0] - 1)

    # :71-78 meshlet bounds to view space
    q = sc["draw_orientation"][draw_id][:, None, :]
    scale = sc["draw_scale"][draw_id][:, None]
    pos = sc["draw_position"][draw_id][:, None, :]
    center = rotate_quat_np(sc["meshlet_center"][mi_c], q) * scale[..., None] + pos
    view = np.asarray(prm.view, f32)
    center = center @ view[:3, :3].T + view[:3, 3]
    radius = sc["meshlet_radius"][mi_c] * scale
    cone_axis = rotate_quat_np(sc["meshlet_cone_axis"][mi_c], q) @ view[:3, :3].T
    cone_cutoff = sc["meshlet_cone_cutoff"][mi_c]

    valid = mgi < task_count[:, None]  # :80
    visible = valid.copy()
    skip = np.zeros_like(valid)

    if int(prm.cluster_occlusion_enabled) == 1 and int(prm.post_pass) == 0:  # :86
        bit = (mvb_words[mvi >> 5] & (np.uint32(1) << (mvi & 31).astype(np.uint32))) != 0
        if not late:
            visible &= bit  # :91-92
        else:
            skip = (late_vis[:, None] == 1) & bit  # :97-98

    # :102 backface cone cull  dot(center, axis) >= cutoff*length(center)+radius
    if int(prm.cluster_backface_enabled) == 1:
        clen = np.sqrt(np.sum(center * center, axis=-1)).astype(f32)
        cone = np.sum(center * cone_axis, axis=-1) >= cone_cutoff * clen + radius
        visible &= ~cone
    visible &= frustum_np(center, radius, prm)  # :104-108

    if late and int(prm.cluster_occlusion_enabled) == 1:  # :110-123
        visible &= occlusion_np(center, radius, prm, atlas, pyr_hw)

    # :125-131 visibility-bit write-back for every valid lane
    new_words = mvb_words.copy()
    live_words = np.zeros_like(mvb_words)
    if late and int(prm.cluster_occlusion_enabled) == 1:
        for k in range(len(cmds)):
            for t in range(TASK_WGSIZE):
                if valid[k, t]:
                    w, b = mvi[k, t] >> 5, np.uint32(1) << np.uint32(mvi[k, t] & 31)
                    live_words[w] |= b
                    if visible[k, t]:
                        new_words[w] |= b
                    else:
                        new_words[w] &= ~b

    out = visible & ~skip  # :133
    vis_set = {(int(draw_id[k]), int(mi[k, t])) for k, t in zip(*np.nonzero(out))}
    return vis_set, new_words, live_words


# ------------------------------------------------------------ harness


def scene_dict(ds) -> dict:
    """Per-draw numpy views of the DeviceScene (mesh tables pre-gathered per
    draw exactly as the engine streams them)."""
    mi = np.asarray(ds.draw_mesh_index)
    return dict(
        draw_position=np.asarray(ds.draw_position, f32),
        draw_scale=np.asarray(ds.draw_scale, f32),
        draw_orientation=np.asarray(ds.draw_orientation, f32),
        draw_post_pass=np.asarray(ds.draw_post_pass),
        draw_vis_offset=np.asarray(ds.draw_vis_offset),
        mesh_center=np.asarray(ds.mesh_center, f32)[mi],
        mesh_radius=np.asarray(ds.mesh_radius, f32)[mi],
        lod_count=np.asarray(ds.mesh_lod_count)[mi],
        lod_error=np.asarray(ds.lod_error, f32)[mi],
        lod_meshlet_count=np.asarray(ds.lod_meshlet_count)[mi],
        lod_meshlet_offset=np.asarray(ds.lod_meshlet_offset)[mi],
        meshlet_center=np.asarray(ds.meshlet_center, f32),
        meshlet_radius=np.asarray(ds.meshlet_radius, f32),
        meshlet_cone_axis=np.asarray(ds.meshlet_cone_axis, f32),
        meshlet_cone_cutoff=np.asarray(ds.meshlet_cone_cutoff, f32),
    )


def engine_commands(ds, cmds) -> set:
    n = int(cmds.count)
    draw_id = np.asarray(cmds.draw_id)
    task_offset = np.asarray(cmds.task_offset)
    task_count = np.asarray(cmds.task_count)
    late_vis = np.asarray(cmds.late_draw_visibility)
    vis_offset = np.asarray(cmds.vis_offset)
    live = np.nonzero(task_count > 0)[0]
    assert len(live) == n, "live command slots must equal the reported count"
    return {
        (int(draw_id[i]), int(task_offset[i]), int(task_count[i]), int(late_vis[i]), int(vis_offset[i]))
        for i in live
    }


def engine_clusters(ds, cmds, ccmd, clane, ccount) -> set:
    n = int(ccount)
    cc = np.asarray(ccmd)[:n]
    cl = np.asarray(clane)[:n]
    draw_id = np.asarray(cmds.draw_id)[cc]
    mi = np.asarray(cmds.task_offset)[cc] + cl
    return {(int(d), int(m)) for d, m in zip(draw_id, mi)}


@pytest.fixture(scope="module")
def parity_scene(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=512)
    return scene_mod.upload(kitten_geometry, draws)


def test_two_frame_parity_vs_glsl_oracle(parity_scene):
    """Two full frames of the two-pass protocol, engine vs GLSL oracle:
    every culling decision bit-identical."""
    ds = parity_scene
    sc = scene_dict(ds)
    cam = Camera()
    W = H = 256
    levels, ph, pw = pyramid.pyramid_shape(W, H)
    prm = make_cull_params(cam, W, H, pw, ph, RenderSettings())[0]
    pyr_hw = (ph, pw)

    n_words = (ds.meshlet_visibility_count + 31) // 32
    # engine state
    dvb_e = jnp.zeros(ds.num_draws, dtype=jnp.int32)
    words_e = jnp.zeros(-(-max(ds.meshlet_visibility_count, 64) // 64) * 2, dtype=jnp.uint32)
    # oracle state
    dvb_o = np.zeros(ds.num_draws, np.int32)
    words_o = np.zeros(n_words, np.uint32)

    for frame in range(2):
        # ---- early pass
        atlas0 = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
        emit_e, lod_e, _ = draw_cull_j(ds, prm, dvb_e, atlas0, late=False, pyramid_shape=pyr_hw)
        cmds_e = build_task_commands_j(ds, emit_e, lod_e, dvb_e, max_groups=8, capacity=1 << 12)
        emit_o, lod_o, _, commands_o = drawcull_oracle(sc, prm, dvb_o, None, pyr_hw, late=False)

        np.testing.assert_array_equal(np.asarray(emit_e), emit_o, err_msg=f"frame {frame} early emit")
        np.testing.assert_array_equal(
            np.asarray(lod_e)[emit_o], lod_o[emit_o], err_msg=f"frame {frame} early lod"
        )
        assert engine_commands(ds, cmds_e) == commands_o, f"frame {frame} early commands"

        ccmd, clane, ccount, _, _ = cluster_cull_j(
            ds, prm, cmds_e, words_e, atlas0, late=False, pyramid_shape=pyr_hw, cluster_capacity=1 << 14
        )
        vis_o, _, _ = clustercull_oracle(sc, prm, commands_o, words_o, None, pyr_hw, late=False)
        assert engine_clusters(ds, cmds_e, ccmd, clane, ccount) == vis_o, f"frame {frame} early clusters"

        # ---- depth pyramid from the engine's early render (both sides
        # consume the SAME pyramid; the raster itself is not under test here)
        tc = raster.transform_clusters(
            ds, ccmd, clane, ccount, cmds_e, prm.view, prm.p00, prm.p11, prm.znear, W, H
        )
        st = raster.compact_setup(tc, W, H, prm.znear, 1 << 14)
        fb = raster.rasterize(st, W, H, small_capacity=1 << 14, big_capacity=64)
        atlas = build_pyramid_j(fb.depth, levels=levels, ph=ph, pw=pw)
        atlas_np = np.asarray(atlas)

        # ---- late pass
        emit_l, lod_l, new_vis = draw_cull_j(ds, prm, dvb_e, atlas, late=True, pyramid_shape=pyr_hw)
        cmds_l = build_task_commands_j(ds, emit_l, lod_l, dvb_e, max_groups=8, capacity=1 << 12)
        emit_lo, lod_lo, dvb_o, commands_lo = drawcull_oracle(
            sc, prm, dvb_o, atlas_np, pyr_hw, late=True
        )
        np.testing.assert_array_equal(np.asarray(emit_l), emit_lo, err_msg=f"frame {frame} late emit")
        np.testing.assert_array_equal(
            np.asarray(lod_l)[emit_lo], lod_lo[emit_lo], err_msg=f"frame {frame} late lod"
        )
        np.testing.assert_array_equal(
            np.asarray(new_vis).astype(np.int32), dvb_o, err_msg=f"frame {frame} dvb write-back"
        )
        assert engine_commands(ds, cmds_l) == commands_lo, f"frame {frame} late commands"

        ccmd_l, clane_l, ccount_l, new_words_e, _ = cluster_cull_j(
            ds, prm, cmds_l, words_e, atlas, late=True, pyramid_shape=pyr_hw, cluster_capacity=1 << 14
        )
        vis_lo, words_o, live_o = clustercull_oracle(
            sc, prm, commands_lo, words_o, atlas_np, pyr_hw, late=True
        )
        assert engine_clusters(ds, cmds_l, ccmd_l, clane_l, ccount_l) == vis_lo, (
            f"frame {frame} late clusters"
        )
        # mvb write-back: compare live bits only (dead-lane bits are
        # unobservable and intentionally differ, see module docstring)
        we = np.asarray(new_words_e)[:n_words]
        np.testing.assert_array_equal(
            we & live_o, words_o & live_o, err_msg=f"frame {frame} mvb write-back"
        )

        dvb_e = new_vis.astype(jnp.int32)
        words_e = new_words_e
        assert int(jnp.sum(dvb_e)) > 0, "scene must have visible draws for the test to bite"
