#!/usr/bin/env python
"""Per-stage timing of the incremental sun-map update (bench config 5).

Reproduces bench.py's animated-tail setup (20K sliced draws of the 1M
scene) and times jitted PREFIXES of update_sun_map + pack_sun_map, so
deltas attribute cost to the stage added last while preserving internal
fusion (same method as tools/profile_frame.py).

Env: PS_DRAWS (default 1M), PS_FRAMES (default 10).
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from niagara_tpu.config import TILE_H, TILE_W
from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker.opacity import bake_opacity
from niagara_tpu.cooker import synth
from niagara_tpu.ops import raster, raster_tile, sunmap as sunmap_mod
from niagara_tpu.ops.cull import build_task_commands
from niagara_tpu.render import presets
from niagara_tpu.render import textures as tex_mod
from niagara_tpu.scene import upload


def main():
    draw_count = int(os.environ.get("PS_DRAWS", 1_000_000))
    frames = int(os.environ.get("PS_FRAMES", 10))
    map_wh = 2048

    t0 = time.time()
    geometry = cook_or_load(
        ["/root/reference/data/kitten.obj"],
        cache_dir=os.path.join(os.path.dirname(__file__), "..", ".cache"),
    )
    draws = synth.synthesize_draws(geometry.meshes.count, draw_count=draw_count)
    synth.synthesize_planar_uvs(geometry)
    materials, texture_mips, mat_idx, post = synth.synthesize_materials(draw_count)
    draws.material_index[:] = mat_idx
    draws.post_pass[:] = post
    masks = bake_opacity(geometry, draws, materials, texture_mips)
    table_host = tex_mod.build_texture_table(mips=texture_mips)
    scene = jax.device_put(upload(geometry, draws, materials, masks, texture_table=table_host))
    print(f"[ps] scene ready {time.time()-t0:.1f}s", file=sys.stderr)

    anim_n = max(draw_count // 50, 1)
    static_n = draw_count - anim_n
    sf = sunmap_mod.fit_sun_to_draws(np.array([0.577, -0.577, 0.577], np.float32), draws)
    ext = np.asarray(jax.device_get(sf["hi"] - sf["lo"]))
    texel_world = float(max(ext[0] / map_wh, ext[1] / map_wh))
    caps_h = presets.headline_capacities(draw_count)
    sun_caps = dict(
        cmd_capacity=caps_h["cmd_capacity"], cluster_capacity=caps_h["cluster_capacity"],
        tri_capacity=min(caps_h["tri_capacity"], 1 << 19),
        pair_capacity=caps_h["pair_capacity"], max_groups=8,
    )
    upd = presets.sunmap_update_capacities(anim_n, sun_caps)
    upd.pop("interpret", None)
    print(f"[ps] update caps: {upd}", file=sys.stderr)

    t0 = time.time()
    _, _, static_tiles = sunmap_mod.build_static_sun_map(
        scene, sf, map_w=map_wh, map_h=map_wh, texel_world=texel_world,
        num_draws=static_n, return_tiles=True, **sun_caps)
    static_tiles.block_until_ready()
    print(f"[ps] static map {time.time()-t0:.1f}s", file=sys.stderr)

    tail = scene.slice_draws(static_n, draw_count)

    def animate(sc, t):
        delta = jnp.stack([jnp.sin(t), jnp.zeros_like(t), 1.0 - jnp.cos(t)]) * 2.0
        return dataclasses.replace(
            sc, draw_position=sc.draw_position + delta,
            draw_xform_row=sc.draw_xform_row.at[:, 0:3].add(delta))

    tail_t = jax.jit(animate)(tail, jnp.float32(0.3))
    tail_t = jax.device_put(jax.device_get(tail_t))  # materialize

    tiles_x, tiles_y = map_wh // TILE_W, map_wh // TILE_H

    # ---- prefixes of the update path ----
    def p_cull(sc, tiles):
        emit, lod = sunmap_mod.sun_cull(sc, sf, None, None, 1, texel_world=texel_world)
        dvb = jnp.ones(sc.num_draws, dtype=jnp.int32)
        cmds = build_task_commands(sc, emit, lod, dvb, max_groups=upd["max_groups"],
                                   capacity=upd["cmd_capacity"])
        return cmds.draw_id.sum()

    def stages(sc, tiles, upto):
        emit, lod = sunmap_mod.sun_cull(sc, sf, None, None, 1, texel_world=texel_world)
        dvb = jnp.ones(sc.num_draws, dtype=jnp.int32)
        cmds = build_task_commands(sc, emit, lod, dvb, max_groups=upd["max_groups"],
                                   capacity=upd["cmd_capacity"])
        if upto == 0:
            return cmds.draw_id.sum()
        ccmd, clane, ccount, cov = sunmap_mod.sun_cluster_cull(
            sc, sf, cmds, upd["cluster_capacity"])
        if upto == 1:
            return ccmd.sum() + ccount
        tc = sunmap_mod.transform_sun(sc, sf, ccmd, clane, ccount, cmds, map_wh, map_wh)
        if upto == 2:
            return tc["hx"].sum()
        st = raster.compact_setup(tc, map_wh, map_wh, 1e-3, upd["tri_capacity"])
        if upto == 3:
            return st["za"].sum()
        if upto == 4:
            out = raster_tile.emit_pairs(
                st, tiles_x=tiles_x, tiles_y=tiles_y, pair_capacity=upd["pair_capacity"])
            return out[0].sum()
        vis_t = jnp.full((tiles_x * tiles_y, TILE_H, TILE_W), raster.INVALID_FRAG, jnp.int32)
        d, v, rst = raster_tile.rasterize_tiles(
            st, tiles, vis_t, tiles_x=tiles_x, tiles_y=tiles_y,
            pair_capacity=upd["pair_capacity"], alpha_test=True)
        if upto == 5:
            return d.sum()
        img = raster_tile.tiles_to_image(d, map_wh, map_wh)
        if upto == 6:
            return img.sum()
        packed = sunmap_mod.pack_sun_map(img)
        return packed.sum()

    names = ["cull+cmds", "+cluster_cull", "+transform", "+setup",
             "+emit_pairs", "+raster", "+tiles_to_image", "+pack"]
    prev = 0.0
    for upto, name in enumerate(names):
        fn = jax.jit(functools.partial(stages, upto=upto))
        r = fn(tail_t, static_tiles)
        r.block_until_ready()
        t0 = time.time()
        for _ in range(frames):
            r = fn(tail_t, static_tiles)
        r.block_until_ready()
        ms = (time.time() - t0) / frames * 1000
        print(f"[ps] {name:18s} {ms:8.2f} ms  (delta {ms - prev:+7.2f})", file=sys.stderr)
        prev = ms


if __name__ == "__main__":
    main()
