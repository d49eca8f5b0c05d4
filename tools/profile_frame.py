#!/usr/bin/env python
"""In-frame stage attribution by PREFIX timing.

tools/profile_stages.py times each stage at its own jit boundary, which
MISATTRIBUTES: a stage returning capacity-sized arrays pays a boundary copy
the real frame fuses away (measured: setup_fused "full out" 36 ms vs 6.5 ms
when only its count crosses the boundary).  Here each measurement jits a
PREFIX of the actual frame pipeline and returns only scalars, so every
internal boundary keeps its in-frame fusion; successive differences
attribute cost to the stage added last.  (Differences can be slightly
negative/noisy — XLA may schedule prefixes differently — but the totals
reconcile with the real frame by construction of the final prefix.)

Env: PF_DRAWS (default 1,000,000), PF_TEXTURED=1 adds materials/alpha,
PF_N (default 5 timing reps).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker import synth
from niagara_tpu.ops import bloom as bloom_mod
from niagara_tpu.ops import cull, pyramid, raster, raster_tile, setup_fused, shade
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render import presets
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.scene import upload


def _sync(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def timed(name, fn, *args, n=5):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    ms = 1000 * (time.time() - t0) / n
    return ms, out


def main():
    draws_n = int(os.environ.get("PF_DRAWS", 1_000_000))
    textured = int(os.environ.get("PF_TEXTURED", 1))
    gltf_city = int(os.environ.get("PF_GLTF", 0))  # profile the city scene
    n = int(os.environ.get("PF_N", 5))
    width, height = 1920, 1080

    from niagara_tpu.cooker.opacity import bake_opacity
    from niagara_tpu.render import textures as tex_mod

    cam, settings = Camera(), RenderSettings()
    sun_dir = None
    if gltf_city:
        from niagara_tpu.cooker import gltf as gltf_mod
        from niagara_tpu.cooker import synth_city

        city_dir = "/root/repo/.cache/city"
        sd = gltf_mod.load_scene(synth_city.ensure_city(city_dir), cache_dir=city_dir)
        geometry, draws = sd.geometry, sd.draws
        mips = tex_mod.load_texture_mips(sd.texture_paths, base_dir=city_dir)
        masks = bake_opacity(geometry, draws, sd.materials, mips)
        table_host = tex_mod.build_texture_table(mips=mips)
        scene = jax.device_put(upload(geometry, draws, sd.materials, masks,
                                      texture_table=table_host))
        table = jax.device_put(table_host)
        post_passes = 2
        caps = presets.scene_capacities(geometry, draws)
        cam = Camera(position=sd.camera_position, orientation=sd.camera_orientation)
        sun_dir = sd.sun_direction
    else:
        geometry = cook_or_load(["/root/reference/data/kitten.obj"], cache_dir="/root/repo/.cache")
        draws = synth.synthesize_draws(geometry.meshes.count, draw_count=draws_n)
        table = None
        post_passes = 1
        if textured:
            synth.synthesize_planar_uvs(geometry)
            materials, texture_mips, mat_idx, post = synth.synthesize_materials(draws_n)
            draws.material_index[:] = mat_idx
            draws.post_pass[:] = post

            masks = bake_opacity(geometry, draws, materials, texture_mips)
            table_host = tex_mod.build_texture_table(mips=texture_mips)
            scene = jax.device_put(upload(geometry, draws, materials, masks, texture_table=table_host))
            table = jax.device_put(table_host)
            post_passes = 2
        else:
            scene = jax.device_put(upload(geometry, draws))
        caps = presets.headline_capacities(draws_n)

    cfg = frame_mod.FrameConfig(
        width=width, height=height,
        max_groups=int(np.ceil(geometry.meshes.lod_meshlet_count.max() / 64)),
        post_passes=post_passes, **caps,
    )
    params, sp = frame_mod.make_frame_inputs(cam, settings, cfg, sun_direction=sun_dir)
    levels, ph, pw = cfg.pyramid_levels_shape
    pyr_hw = (ph, pw)
    tiles_x = width // raster_tile.TILE_W
    tiles_y = height // raster_tile.TILE_H
    n_tiles = tiles_x * tiles_y

    # converge the carried visibility state with a few real frames first so
    # every prefix sees steady-state work
    state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)
    for _ in range(3):
        _, _, state, _ = frame_mod.render_frame(scene, state, params, sp, cfg, textures=table)
    state = jax.tree.map(lambda a: a, state)
    _sync(state)

    empty_atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    groups = cfg.late_class_groups

    def s8(x):
        return jnp.sum(x[..., :1].astype(jnp.float32))

    # ---- prefixes of the EXACT frame pipeline (cf. frame.frame_core) ----
    def p_drawcull(scene, state):
        emit_e, lod_e, _ = cull.draw_cull(
            scene, params, state.draw_vis, empty_atlas, late=False, pyramid_shape=pyr_hw)
        return jnp.sum(emit_e) + jnp.sum(lod_e)

    def _early(scene, state):
        emit_e, lod_e, _ = cull.draw_cull(
            scene, params, state.draw_vis, empty_atlas, late=False, pyramid_shape=pyr_hw)
        cdraw, cmi, ccount, _, nd, _, _ = cull.cluster_cull_direct(
            scene, params, emit_e, lod_e, state.draw_vis, state.vis_words, empty_atlas,
            late=False, pyramid_shape=pyr_hw,
            draw_capacity=cfg.cmd_capacity, cluster_capacity=cfg.cluster_capacity,
            candidate_capacity=cfg.candidate_cap)
        return cdraw, cmi, ccount

    def p_cull(scene, state):
        cdraw, cmi, ccount = _early(scene, state)
        return ccount + jnp.sum(cdraw[:8])

    def _early_setup(scene, state):
        cdraw, cmi, ccount = _early(scene, state)
        cdraw, cmi = raster.order_clusters_by_x(scene, params, cdraw, cmi, ccount)
        tc = raster.transform_meta_direct(scene, cdraw, cmi, ccount)
        st = setup_fused.setup_compact(tc, params, cfg.width, cfg.height, cfg.tri_capacity)
        return st

    def p_setup(scene, state):
        return _early_setup(scene, state)["count"]

    def p_emit(scene, state):
        st = _early_setup(scene, state)
        _, tile_start, pair_count, _, _, _ = raster_tile.emit_pairs(
            st, tiles_x=tiles_x, tiles_y=tiles_y, pair_capacity=cfg.pair_capacity,
            giant_capacity=cfg.giant_capacity)
        return pair_count + tile_start[-1]

    def _early_raster(scene, state):
        st = _early_setup(scene, state)
        depth_t = jnp.zeros((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
        vis_t = jnp.full((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), raster.INVALID_FRAG, jnp.int32)
        depth_t, vis_t, rst = raster_tile.rasterize_tiles(
            st, depth_t, vis_t, tiles_x=tiles_x, tiles_y=tiles_y,
            pair_capacity=cfg.pair_capacity, giant_capacity=cfg.giant_capacity)
        return depth_t, vis_t, rst

    def p_raster(scene, state):
        depth_t, vis_t, rst = _early_raster(scene, state)
        return s8(depth_t) + s8(vis_t)

    def _pyramid(scene, state):
        depth_t, vis_t, rst = _early_raster(scene, state)
        depth = raster_tile.tiles_to_image(depth_t, height, width)
        atlas = pyramid.build_pyramid(depth, levels, ph, pw)
        return depth_t, vis_t, rst, atlas

    def p_pyramid(scene, state):
        return s8(_pyramid(scene, state)[3])

    def _late_cull(scene, state):
        depth_t, vis_t, rst, atlas = _pyramid(scene, state)
        emit_l, lod_l, ndv = cull.draw_cull(
            scene, params, state.draw_vis, atlas, late=True,
            pyramid_shape=pyr_hw, num_classes=cfg.post_passes)
        per_group, nw, _, _, _, _ = cull.cluster_cull_direct_multi(
            scene, params, emit_l, lod_l, state.draw_vis, state.vis_words, atlas,
            late=True, pyramid_shape=pyr_hw, draw_capacity=cfg.cmd_capacity,
            cluster_capacity=cfg.late_cluster_cap,
            candidate_capacity=cfg.late_candidate_cap,
            num_classes=cfg.post_passes, class_groups=groups)
        return depth_t, vis_t, rst, atlas, per_group

    def p_latecull(scene, state):
        pg = _late_cull(scene, state)[4]
        return sum(c for (_, _, c) in pg)

    def _late_raster(scene, state):
        depth_t, vis_t, rst, atlas, per_group = _late_cull(scene, state)
        streams = [rst["stream"]]
        for g, (cdraw_p, cmi_p, ccount_p) in enumerate(per_group):
            cdraw_p, cmi_p = raster.order_clusters_by_x(scene, params, cdraw_p, cmi_p, ccount_p)
            tc_p = raster.transform_meta_direct(scene, cdraw_p, cmi_p, ccount_p)
            st_p = setup_fused.setup_compact(tc_p, params, cfg.width, cfg.height, cfg.late_tri_cap)
            depth_t, vis_t, rst_p = raster_tile.rasterize_tiles(
                st_p, depth_t, vis_t, tiles_x=tiles_x, tiles_y=tiles_y,
                pair_capacity=cfg.late_pair_cap, frag_offset=cfg.tri_capacity + g * cfg.late_tri_cap,
                giant_capacity=cfg.giant_capacity, alpha_test=1 in groups[g])
            streams.append(rst_p["stream"])
        return depth_t, vis_t, streams

    def p_lateraster(scene, state):
        depth_t, vis_t, _ = _late_raster(scene, state)
        return s8(depth_t) + s8(vis_t)

    def _shade(scene, state):
        depth_t, vis_t, streams = _late_raster(scene, state)
        attr_t = jnp.zeros((n_tiles, raster_tile.ATTR_CHANNELS, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
        attr_t = raster_tile.shade_tiles(streams, vis_t, attr_t, tiles_x=tiles_x)
        return depth_t, vis_t, attr_t

    def p_shade(scene, state):
        return s8(_shade(scene, state)[2])

    def _gbuf(scene, state):
        depth_t, vis_t, attr_t = _shade(scene, state)
        depth = raster_tile.tiles_to_image(depth_t, height, width)
        vis = raster_tile.tiles_to_image(vis_t, height, width)
        attrs = raster_tile.attr_tiles_to_image(attr_t, height, width)
        g0, g1, valid = shade.gbuffer_from_attrs(
            attrs, vis != raster.INVALID_FRAG, scene, textures=table, depth=depth,
            inverse_view_projection=sp.inverse_view_projection)
        return depth, g0, g1, valid

    def p_gbuf(scene, state):
        return s8(_gbuf(scene, state)[1])

    def p_composite(scene, state):
        depth, g0, g1, valid = _gbuf(scene, state)
        bl = bloom_mod.sample_bloom_fullres(
            bloom_mod.compute_bloom(g0, width, height), width, height)
        img = shade.composite(
            g0, g1, depth, valid, camera_position=sp.camera_position,
            sun_direction=sp.sun_direction,
            inverse_view_projection=sp.inverse_view_projection,
            bloom=bl, width=width, height=height)
        return s8(img)

    def p_full(scene, state):
        out = frame_mod.render_frame(scene, state, params, sp, cfg, textures=table)
        return s8(out[0])

    prefixes = [
        ("drawcull(early)", p_drawcull),
        ("+cluster_cull_direct", p_cull),
        ("+order+meta+setup", p_setup),
        ("+emit_pairs(sort)", p_emit),
        ("+stream+raster kernel", p_raster),
        ("+pyramid", p_pyramid),
        ("+late cull(multi)", p_latecull),
        ("+late setup/emit/raster", p_lateraster),
        ("+shade kernel", p_shade),
        ("+gbuffer(textured)" if textured else "+gbuffer", p_gbuf),
        ("+bloom+composite", p_composite),
        ("FULL render_frame", p_full),
    ]

    # chip-state reference for cross-session normalization
    y = jnp.zeros((1024, 2048), jnp.float32)
    ref_ms, _ = timed("dense8MB", jax.jit(lambda y: y * 2 + 1), y, n=20)
    print(f"{'dense 8MB (chip ref)':28s} {ref_ms:9.2f} ms", flush=True)

    # PF_ONLY=substr,substr runs only matching prefixes (deltas then span
    # the skipped stages — useful for fast kernel iteration)
    only = [s for s in os.environ.get("PF_ONLY", "").split(",") if s]
    if only:
        prefixes = [(nm, fn) for nm, fn in prefixes
                    if any(s in nm for s in only)]

    prev = 0.0
    for name, fn in prefixes:
        ms, _ = timed(name, jax.jit(fn), scene, state, n=n)
        print(f"{name:28s} {ms:9.2f} ms  (+{ms - prev:7.2f})", flush=True)
        if not name.startswith("FULL"):
            prev = ms


if __name__ == "__main__":
    main()
