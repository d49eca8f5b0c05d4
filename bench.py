#!/usr/bin/env python
"""Benchmark: the reference's default synthetic load on one TPU chip.

Scene: kitten.obj instanced 1,000,000 times in a 300-unit cube (bit-exact
PCG32 placement, reference niagara.cpp:969-998), rendered at 1080p with the
FULL frame the reference renders (niagara.cpp:1766-1928): two-pass meshlet
occlusion culling, software raster, alpha-tested post pass, textured
deferred shading, sun shadows (cached sun-map resolve), bloom, final
composite.  The scene additionally carries a synthetic textured material
set with an alpha-cutout class (the reference's OBJ mode is untextured;
VERDICT r2 asked the headline to cover the textured + alpha + shadow
frame, so the synthetic scene was extended to exercise all of it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "probe"}.
The reference publishes no numbers (BASELINE.md); vs_baseline normalizes
against the 16.7 ms vsync frame budget the reference runs at by default
(CONFIG_VSYNC=1, config.h:37): vs_baseline = 16.7 / frame_ms (>1 = faster
than the 60 Hz budget).  "probe" embeds tools/bwprobe.py's measured
primitive throughput on the SAME chip state, so per-stage roofline claims
(README stage table) are verifiable against the live chip, not spec sheets.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# BENCH_CPU=1: wiring smoke-test off-chip (Pallas kernels interpreted).
# The env var alone is not enough — the axon PJRT plugin registers at
# interpreter start and wins unless the config flag forces CPU.
_CPU = int(os.environ.get("BENCH_CPU", 0))
if _CPU:
    jax.config.update("jax_platforms", "cpu")

from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker.opacity import bake_opacity
from niagara_tpu.cooker import synth
from niagara_tpu.ops import sunmap as sunmap_mod
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render import textures as tex_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.scene import upload

KITTEN = "/root/reference/data/kitten.obj"


def main():
    draw_count = int(os.environ.get("BENCH_DRAWS", 1_000_000))
    width = int(os.environ.get("BENCH_W", 1920))
    height = int(os.environ.get("BENCH_H", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 5))
    textured = int(os.environ.get("BENCH_TEXTURES", 1))
    with_shadows = int(os.environ.get("BENCH_SUNMAP", 1))
    with_alpha = int(os.environ.get("BENCH_ALPHA", 1))
    map_wh = int(os.environ.get("BENCH_MAP", 2048))

    t0 = time.time()
    geometry = cook_or_load([KITTEN], cache_dir=os.path.join(os.path.dirname(__file__), ".cache"))
    draws = synth.synthesize_draws(geometry.meshes.count, draw_count=draw_count)

    table = masks = None
    if textured:
        # synthetic textured material set + planar uvs (kitten.obj has no
        # vt records); material N-1 is an alpha cutout -> 1/8 of draws ride
        # the alpha-tested post pass with baked opacity masks
        synth.synthesize_planar_uvs(geometry)
        materials, texture_mips, mat_idx, post = synth.synthesize_materials(draw_count)
        draws.material_index[:] = mat_idx
        if with_alpha:
            draws.post_pass[:] = post
            masks = bake_opacity(geometry, draws, materials, texture_mips)
        table_host = tex_mod.build_texture_table(mips=texture_mips)
        scene = upload(geometry, draws, materials, masks, texture_table=table_host)
        table = jax.device_put(table_host)
    else:
        scene = upload(geometry, draws)
    print(f"[bench] scene ready in {time.time()-t0:.1f}s: {draw_count} draws, "
          f"{scene.num_meshlets} meshlets, vis slots {scene.meshlet_visibility_count}, "
          f"textured={bool(table is not None)} alpha_masks={scene.has_alpha_masks}",
          file=sys.stderr)

    scene = jax.device_put(scene)

    # capacities sized to the synthetic scene's steady-state visible set;
    # the 16-level LOD chain keeps visible clusters near the visible draw
    # count, so the same budgets cover 100k and 1M draws.  Env-overridable.
    big = draw_count > 300_000
    cfg = frame_mod.FrameConfig(
        width=width,
        height=height,
        max_groups=int(np.ceil(geometry.meshes.lod_meshlet_count.max() / 64)),
        cmd_capacity=int(os.environ.get("BENCH_CMD_CAP", 1 << 16 if big else 1 << 14)),
        cluster_capacity=int(os.environ.get("BENCH_CLUSTER_CAP", 1 << 16)),
        # measured at 1M draws steady state: ~531k live triangles, ~1.05M
        # tile pairs — 640k/1.25M leave ~20% headroom with zero drops (the
        # drop counters in the stats line guard this)
        tri_capacity=int(os.environ.get("BENCH_TRI_CAP", 640 * 1024)),
        pair_capacity=int(os.environ.get("BENCH_PAIR_CAP", 1280 * 1024)),
        late_cluster_capacity=int(os.environ.get("BENCH_LATE_CLUSTER_CAP", 1 << 14)),
        late_tri_capacity=int(os.environ.get("BENCH_LATE_TRI_CAP", 1 << 18)),
        post_passes=2 if (with_alpha and textured) else 1,
        shadows=bool(with_shadows),
        raster_interpret=bool(_CPU),
    )

    cam = Camera()
    settings = RenderSettings()
    params, sp = frame_mod.make_frame_inputs(cam, settings, cfg)
    state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)

    # --- cached sun map (static scene): built once like the reference's
    # TLAS, resolved per frame in the headline (niagara.cpp:1792-1855 role)
    shadow_ctx = None
    if with_shadows:
        from functools import partial as _partial

        sf = sunmap_mod.fit_sun_to_draws(np.asarray(sp.sun_direction), draws)
        build_map = _partial(
            sunmap_mod.build_static_sun_map, scene, sf,
            map_w=map_wh, map_h=map_wh,
            cmd_capacity=cfg.cmd_capacity, cluster_capacity=cfg.cluster_capacity,
            # 2048x2048 -> 4096 tiles (13 key bits), so tri capacity is
            # capped at 2^19 to keep the packed (tile, tri) sort key in u32
            tri_capacity=min(cfg.tri_capacity, 1 << 19),
            pair_capacity=cfg.pair_capacity,
            max_groups=cfg.max_groups,
            interpret=bool(_CPU),
        )
        t0 = time.time()
        smap, sm_drops = build_map()
        packed = jax.jit(sunmap_mod.pack_sun_map)(smap)
        _ = np.asarray(packed[:1, :1])
        print(f"[bench] static sun map build+pack {time.time()-t0:.1f}s "
              f"(compile incl.; {map_wh}x{map_wh}, dropped {int(sm_drops)})", file=sys.stderr)
        t0 = time.time()
        smap, sm_drops = build_map()
        packed = jax.jit(sunmap_mod.pack_sun_map)(smap)
        _ = np.asarray(packed[:1, :1])
        print(f"[bench] sun map rebuild {1000*(time.time()-t0):.1f}ms warm "
              f"(amortized: static scenes reuse it every frame)", file=sys.stderr)
        shadow_ctx = (sf, packed, (map_wh, map_wh))

    render = lambda st: frame_mod.render_frame(
        scene, st, params, sp, cfg, bvh=shadow_ctx, textures=table
    )

    # warmup: compile + converge visibility state
    t0 = time.time()
    image, fb, state, stats = render(state)
    _ = np.asarray(image[:1, :1])
    compile_s = time.time() - t0
    print(f"[bench] first frame (compile) {compile_s:.1f}s", file=sys.stderr)
    t0 = time.time()
    image, fb, state, stats = render(state)
    _ = np.asarray(image[:1, :1])
    print(f"[bench] second frame {1000*(time.time()-t0):.2f}ms; "
          f"stats: early_cmd={int(stats.early_commands)} late_cmd={int(stats.late_commands)} "
          f"early_clusters={int(stats.early_clusters)} late_clusters={int(stats.late_clusters)} "
          f"visible_draws={int(stats.visible_draws)}", file=sys.stderr)
    print(f"[bench] drops: cmd={int(stats.cmd_dropped)} cluster={int(stats.cluster_dropped)} "
          f"tri={int(stats.tri_dropped)} pair={int(stats.pair_dropped)} "
          f"(all must be 0 for a loss-free frame)", file=sys.stderr)

    # frames chain through the carried visibility state, so dispatching the
    # whole run and syncing once measures true frame throughput (the relay
    # between host and chip adds large per-dispatch latency otherwise)
    t0 = time.time()
    for _ in range(frames):
        image, fb, state, stats = render(state)
    _ = np.asarray(image[:1, :1])  # hard sync (block_until_ready is unreliable here)
    frame_ms = float((time.time() - t0) / frames * 1000)

    covered = int(np.asarray((fb.vis != 0x7FFFFFFF)[::8, ::8].sum()) * 64)
    scope = "cull+raster" + ("+alpha" if cfg.post_passes > 1 else "") \
        + ("+textured shade" if table is not None else "+shade") \
        + ("+sunshadow" if with_shadows else "") + "+bloom+final"
    print(f"[bench] {frame_ms:.2f}ms/frame over {frames} chained frames "
          f"({scope}); covered px ~{covered}", file=sys.stderr)

    if int(os.environ.get("BENCH_SHADOW", 0)):
        # ray-traced sun shadows side metric (parity oracle; the sun map is
        # the production path).  Reference niagara.cpp:1792-1855.
        from niagara_tpu.ops import shadow as shadow_mod

        t0 = time.time()
        bvh, rt_static = shadow_mod.build_scene_rt(geometry, draws)
        build_s = time.time() - t0
        t0 = time.time()
        bvh = shadow_mod.refit_tlas(rt_static, draws)
        refit_s = time.time() - t0
        bvh = jax.device_put(bvh)
        sh_fn = lambda d: shadow_mod.shadow_pass(
            d, bvh,
            sun_direction=sp.sun_direction,
            inverse_view_projection=sp.inverse_view_projection,
            width=width, height=height, scale=2, chunked=True,
        )
        t0 = time.time()
        shimg = sh_fn(fb.depth)
        _ = np.asarray(shimg[:1, :1])
        print(f"[bench] rt shadow compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        shimg = sh_fn(fb.depth)
        _ = np.asarray(shimg[:1, :1])
        shadow_ms = (time.time() - t0) * 1000
        print(f"[bench] shadow_pass(rt) {shadow_ms:.2f}ms at 1/2 res "
              f"(TLAS build {build_s:.1f}s, refit {refit_s:.3f}s, "
              f"{draw_count} instances)", file=sys.stderr)

    # measured chip primitives for roofline verification (same process,
    # same chip state as the frame numbers above)
    probe = {}
    if int(os.environ.get("BENCH_PROBE", 1)):
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import bwprobe

        probe = bwprobe.probe(quick=True)
        print(f"[bench] chip probe: {json.dumps(probe)}", file=sys.stderr)

    print(json.dumps({
        "metric": f"kitten_{draw_count//1000}k_draws_{width}x{height}_full_frame_time",
        "value": round(frame_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.7 / frame_ms, 4),
        "compile_s": round(compile_s, 1),
        "probe": probe,
    }))


if __name__ == "__main__":
    main()
