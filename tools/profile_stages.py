#!/usr/bin/env python
"""Per-stage wall timing of the frame pipeline on the real chip.

Stage analog of the reference's per-pass GPU timestamps (niagara.cpp HUD
mode 2).  Each stage is jitted separately; times include no compile (warmup
call first).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops import cull, pyramid, raster, shade
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.scene import upload


def _sync(out):
    """Hard sync: block_until_ready is unreliable through the chip relay
    (it can return before execution), so read one element back to host."""
    leaves = jax.tree.leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


ROWS = []  # (name, ms) for the end-of-run floor-vs-actual table


def timed(name, fn, *args, n=10, **kwargs):
    out = fn(*args, **kwargs)
    _sync(out)
    # issue n dependent-free calls back to back (they serialize on the device
    # stream), sync once; per-call time amortizes the relay round-trip
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kwargs)
    _sync(out)
    ms = 1000 * (time.time() - t0) / n
    print(f"{name:28s} {ms:9.2f} ms", flush=True)
    ROWS.append((name, ms))
    return out


def print_floors(sizes, probe):
    """Roofline floors per stage from MEASURED chip rates (tools/bwprobe.py),
    next to the actuals — the bytes each stage must move at minimum, divided
    by the measured rate for its dominant access pattern.  Estimates are
    byte counts of the stage's irreducible inputs+outputs (intermediates XLA
    fuses are excluded); see the formulas below."""
    dense = probe.get("dense_gbps", 0) or 1e-9
    rowg = probe.get("gather_row224B_f32_gbps", dense) or 1e-9
    row2k = probe.get("gather_row2560B_gbps", rowg) or 1e-9
    sort4m = probe.get("sort4M_u32_ms", 0)

    D, C, K, Tc, P, NT, PX, W, H = (sizes[k] for k in
                                    ("D", "C", "K", "Tc", "P", "NT", "PX", "W", "H"))
    NCHUNK = P // 128 + NT  # per-tile chunk visits (partial chunks ~ 1/tile)
    floors = {
        # dense streams: draw rows (84B) + xform (32B) + flags + 3 outputs
        "drawcull": ("dense", D * 136 / dense),
        # [D] mask scans (MXU prefix: ~2 passes) + [C]-scale row gathers
        "build_task_commands": ("dense", (D * 24 + C * 160) / dense),
        # [C]-row cull-block gathers (1KB) + xform rows + [K] outputs
        "clustercull": ("row-gather", C * 1056 / row2k + K * 16 / dense),
        # [D] prefix+scatter + per-cluster 32B cull/xform row gathers
        "cluster_cull_direct": ("row-gather", (D * 24 + C * 160) / dense + K * 64 / rowg),
        "transform_meta(gather)": ("row-gather", K * 52 / rowg),
        # per-live-cluster 4KB setup-row DMA + record-store write (cap x 512B)
        "setup_fused(kernel)": ("row-DMA", K * 4096 / row2k + Tc * 512 / dense),
        # u32 key sort at emission-slot scale (probe: 4.2M-key sort)
        "emit_pairs(sort)": ("sort", sort4m * (2 * Tc + Tc // 2) / (4 << 20)),
        # [P] 224B record-row gathers + chunk-major stream write
        "stream build (gather+T)": ("row-gather", P * 224 / rowg + P * 224 / dense),
        # per-chunk slim DMA (16 rows = 8KB) + tile depth/vis in+out
        "rasterize_tiles+emit": ("DMA", (NCHUNK * 8192 + NT * PX * 16) / dense),
        "depth_pyramid": ("dense", W * H * 4 * 2.7 / dense),
        # per-chunk 48-row DMA (24KB) + attr planes (13ch in+out) + vis
        "shade_tiles(+re-raster)": ("DMA", (NCHUNK * 24576 + NT * PX * (26 * 4 + 4)) / dense),
        "gbuffer_from_attrs": ("dense", W * H * (13 * 4 + 24) / dense),
        "composite": ("dense", W * H * 40 / dense),
        "bloom": ("dense", W * H * 4 * 6 / dense),
    }
    print("\n-- floor-vs-actual (measured rates: "
          f"dense {dense} GB/s, row-gather {rowg}/{row2k} GB/s, "
          f"4M-u32 sort {sort4m} ms) --")
    print(f"{'stage':28s} {'actual':>9s} {'floor':>9s} {'pattern':>12s}")
    for name, ms in ROWS:
        if name in floors:
            pat, fl_ns = floors[name]
            print(f"{name:28s} {ms:8.2f}m {fl_ns/1e6:8.2f}m {pat:>12s}")
        else:
            print(f"{name:28s} {ms:8.2f}m {'':>9s}")


def main():
    draws_n = int(os.environ.get("PROF_DRAWS", 100_000))
    width, height = 1920, 1080

    geometry = cook_or_load(["/root/reference/data/kitten.obj"], cache_dir="/root/repo/.cache")
    draws = synthesize_draws(geometry.meshes.count, draw_count=draws_n)
    scene = jax.device_put(upload(geometry, draws))

    cfg = frame_mod.FrameConfig(
        width=width, height=height, max_groups=8,
        cmd_capacity=1 << 16, cluster_capacity=1 << 16,
        small_capacity=1 << 21, big_capacity=512,
        pair_capacity=1 << 20, tri_capacity=1 << 19,
        late_cluster_capacity=1 << 14, late_tri_capacity=1 << 18,
    )
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg)
    levels, ph, pw = cfg.pyramid_levels_shape
    pyr_hw = (ph, pw)
    atlas0 = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    dvb = jnp.ones(scene.num_draws, dtype=jnp.int32)
    vis_words = jnp.full((max(scene.meshlet_visibility_count, 64) + 31) // 32 + 2, 0xFFFFFFFF, dtype=jnp.uint32)

    dc = partial(jax.jit, static_argnames=("late", "pyramid_shape"))(cull.draw_cull)
    emit, lod, vis = timed("drawcull", dc, scene, params, dvb, atlas0, late=False, pyramid_shape=pyr_hw)

    btc = partial(jax.jit, static_argnames=("max_groups", "capacity"))(cull.build_task_commands)
    cmds = timed("build_task_commands", btc, scene, emit, lod, dvb, max_groups=cfg.max_groups, capacity=cfg.cmd_capacity)

    cc = partial(jax.jit, static_argnames=("late", "pyramid_shape", "cluster_capacity"))(cull.cluster_cull)
    ccmd, clane, ccount, _, _ = timed(
        "clustercull", cc, scene, params, cmds, vis_words, atlas0,
        late=False, pyramid_shape=pyr_hw, cluster_capacity=cfg.cluster_capacity,
    )
    print(f"{'':28s} [commands={int(cmds.count)} clusters={int(ccount)}]")

    # cluster-direct path (the frame default): replaces btc + clustercull
    ccd = partial(
        jax.jit,
        static_argnames=("late", "pyramid_shape", "draw_capacity", "cluster_capacity"),
    )(cull.cluster_cull_direct)
    cdraw, cmi, ccount_d, _, ncmd_d, _, _ = timed(
        "cluster_cull_direct", ccd, scene, params, emit, lod, dvb, vis_words, atlas0,
        late=False, pyramid_shape=pyr_hw,
        draw_capacity=cfg.cmd_capacity, cluster_capacity=cfg.cluster_capacity,
    )
    print(f"{'':28s} [direct: draws={int(ncmd_d)} clusters={int(ccount_d)}]")

    from niagara_tpu.ops import setup_fused

    tmf = jax.jit(raster.transform_meta)
    tc = timed("transform_meta(gather)", tmf, scene, ccmd, clane, ccount, cmds)

    st = timed(
        "setup_fused(kernel)",
        jax.jit(lambda t: setup_fused.setup_compact(t, params, cfg.width, cfg.height, cfg.tri_capacity)),
        tc,
    )
    print(f"{'':28s} [valid tris={int(st['count'])}]", flush=True)

    from niagara_tpu.ops import raster_tile
    tiles_x = cfg.width // raster_tile.TILE_W
    tiles_y = cfg.height // raster_tile.TILE_H
    n_tiles = tiles_x * tiles_y

    ep = partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "pair_capacity"))(raster_tile.emit_pairs)
    pair_tri, tile_start, pair_count, huge, _dv, _dm = timed(
        "emit_pairs(sort)", ep, st, tiles_x=tiles_x, tiles_y=tiles_y, pair_capacity=cfg.pair_capacity)
    print(f"{'':28s} [pairs={int(pair_count)} huge_dropped={int(huge)}]", flush=True)

    # record row-gather + chunk-major relayout alone (the pair stream build)
    def stream_build(rec, pt):
        rows = rec[pt][:, : raster_tile.REC]
        P = rows.shape[0]
        nc = -(-P // 128) + 1
        rows = jnp.concatenate([rows, jnp.zeros((nc * 128 - P, raster_tile.REC), rows.dtype)], axis=0)
        return jnp.swapaxes(rows.reshape(nc, 128, raster_tile.REC), 1, 2)
    timed("stream build (gather+T)", jax.jit(stream_build), st["rec48"], pair_tri)

    def tile_raster(st):
        depth_t = jnp.zeros((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
        vis_t = jnp.full((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), 0x7FFFFFFF, jnp.int32)
        d, v, _ = raster_tile.rasterize_tiles(
            st, depth_t, vis_t, tiles_x=tiles_x, tiles_y=tiles_y,
            pair_capacity=cfg.pair_capacity)
        return raster_tile.tiles_to_image(d, cfg.height, cfg.width), raster_tile.tiles_to_image(v, cfg.height, cfg.width)

    depth_img, vis_img = timed("rasterize_tiles+emit", jax.jit(tile_raster), st)
    from niagara_tpu.ops.raster import Framebuffer
    fb = Framebuffer(depth=depth_img, vis=vis_img)

    pj = partial(jax.jit, static_argnames=("levels", "ph", "pw"))(pyramid.build_pyramid)
    timed("depth_pyramid", pj, fb.depth, levels, ph, pw)

    def shade_kernel(st, vis_img):
        depth_t = jnp.zeros((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
        vis_t0 = jnp.full((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), 0x7FFFFFFF, jnp.int32)
        _, vis_t, rst = raster_tile.rasterize_tiles(
            st, depth_t, vis_t0, tiles_x=tiles_x, tiles_y=tiles_y, pair_capacity=cfg.pair_capacity
        )
        attr_t = jnp.zeros(
            (n_tiles, raster_tile.ATTR_CHANNELS, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32
        )
        attr_t = raster_tile.shade_tiles(rst["stream"], vis_t, attr_t, tiles_x=tiles_x)
        return raster_tile.attr_tiles_to_image(attr_t, cfg.height, cfg.width)

    attrs_img = timed("shade_tiles(+re-raster)", jax.jit(shade_kernel), st, vis_img)

    sg2 = jax.jit(lambda a, v: shade.gbuffer_from_attrs(a, v != 0x7FFFFFFF, scene))
    g0, g1, valid = timed("gbuffer_from_attrs", sg2, attrs_img, vis_img)

    co = jax.jit(
        lambda g0, g1, d, v, sp: shade.composite(
            g0, g1, d, v,
            camera_position=sp.camera_position, sun_direction=sp.sun_direction,
            inverse_view_projection=sp.inverse_view_projection,
            width=cfg.width, height=cfg.height,
        )
    )
    timed("composite", co, g0, g1, fb.depth, valid, sp)

    from niagara_tpu.ops import bloom as bloom_mod
    bl = partial(jax.jit, static_argnames=("width", "height"))(bloom_mod.compute_bloom)
    timed("bloom", bl, g0, width=cfg.width, height=cfg.height)

    # whole frame (same config as the stages above), for reconciliation
    state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)
    out = frame_mod.render_frame(scene, state, params, sp, cfg)
    state = out[2]
    timed("FULL render_frame", lambda s: frame_mod.render_frame(scene, s, params, sp, cfg), state, n=5)

    # ---- full headline scope: textured materials, alpha class, sun map ----
    if int(os.environ.get("PROF_FULL", 1)):
        import dataclasses

        from niagara_tpu.cooker import synth
        from niagara_tpu.cooker.opacity import bake_opacity
        from niagara_tpu.ops import sunmap as sunmap_mod
        from niagara_tpu.render import presets
        from niagara_tpu.render import textures as tex_mod

        synth.synthesize_planar_uvs(geometry)
        materials, texture_mips, mat_idx, post = synth.synthesize_materials(draws_n)
        draws.material_index[:] = mat_idx
        draws.post_pass[:] = post
        masks = bake_opacity(geometry, draws, materials, texture_mips)
        table_host = tex_mod.build_texture_table(mips=texture_mips)
        from niagara_tpu.scene import upload as upload2

        scene_t = jax.device_put(upload2(geometry, draws, materials, masks, texture_table=table_host))
        table = jax.device_put(table_host)

        caps = presets.headline_capacities(draws_n)
        cfg_full = frame_mod.FrameConfig(
            width=width, height=height, max_groups=8, post_passes=2,
            shadows=True, **caps,
        )
        params_f, sp_f = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg_full)

        # merged multi-class late cull (the one [D]-scale pass feeding all
        # classes) vs the per-class sequential shape it replaced
        dvb1 = jnp.ones(scene_t.num_draws, dtype=jnp.int32)
        emit_l, lod_l, _ = dc(scene_t, params_f, dvb1, atlas0, late=True, pyramid_shape=pyr_hw)
        ccm = partial(jax.jit, static_argnames=(
            "late", "pyramid_shape", "draw_capacity", "cluster_capacity",
            "candidate_capacity", "num_classes"))(cull.cluster_cull_direct_multi)
        timed(
            "cull_direct_multi(late,2cls)", ccm, scene_t, params_f, emit_l, lod_l,
            dvb1, vis_words, atlas0, late=True, pyramid_shape=pyr_hw,
            draw_capacity=cfg_full.cmd_capacity,
            cluster_capacity=cfg_full.late_cluster_cap,
            candidate_capacity=cfg_full.late_candidate_cap, num_classes=2,
        )

        # textured dense shading (3 gathers/px: mat row + mip row + quad)
        sg3 = jax.jit(lambda a, v: shade.gbuffer_from_attrs(
            a, v != 0x7FFFFFFF, scene_t, textures=table, depth=depth_img,
            inverse_view_projection=sp_f.inverse_view_projection))
        timed("gbuffer_from_attrs(tex)", sg3, attrs_img, vis_img)

        # sun-map resolve + pack at bench map size (contents don't matter
        # for timing; gathers dominate)
        map_wh = int(os.environ.get("PROF_MAP", 2048))
        sf = sunmap_mod.fit_sun_to_draws(np.asarray(sp_f.sun_direction), draws)
        packed = jnp.zeros((map_wh * map_wh, 4), jnp.float32)
        smp = jax.jit(partial(
            sunmap_mod.shadow_map_pass, sf=sf, sun_map=None,
            inverse_view_projection=sp_f.inverse_view_projection,
            width=width, height=height, packed=packed,
            map_shape=(map_wh, map_wh), blur=True, znear=params_f.znear))
        timed("sunmap resolve(+blur)", lambda d: smp(d), fb.depth)
        timed("sunmap pack", jax.jit(sunmap_mod.pack_sun_map),
              jnp.zeros((map_wh, map_wh), jnp.float32))

        # the whole headline frame (bench.py scope)
        state_f = frame_mod.init_state(scene_t.num_draws, scene_t.meshlet_visibility_count)
        shadow_ctx = (sf, packed, (map_wh, map_wh))
        rf = lambda s: frame_mod.render_frame(
            scene_t, s, params_f, sp_f, cfg_full, bvh=shadow_ctx, textures=table)
        out = rf(state_f)
        _sync(out)
        state_f = out[2]
        timed("FULL frame (bench scope)", rf, state_f, n=5)

    if int(os.environ.get("PROF_FLOORS", 1)):
        import bwprobe

        probe = bwprobe.probe(quick=True)
        sizes = dict(
            D=scene.num_draws, C=cfg.cmd_capacity,
            K=int(ccount), Tc=cfg.tri_capacity, P=int(pair_count),
            NT=n_tiles, PX=raster_tile.TILE_H * raster_tile.TILE_W,
            W=width, H=height,
        )
        print_floors(sizes, probe)


if __name__ == "__main__":
    main()
