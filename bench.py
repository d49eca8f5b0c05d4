#!/usr/bin/env python
"""Benchmark: the reference's default synthetic load on one TPU chip.

Scene: kitten.obj instanced 1,000,000 times in a 300-unit cube (bit-exact
PCG32 placement, reference niagara.cpp:969-998), rendered at 1080p with the
full two-pass meshlet occlusion pipeline (frustum + cone + occlusion cull,
LOD select, software raster, deferred shade).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline normalizes
against the 16.7 ms vsync frame budget the reference runs at by default
(CONFIG_VSYNC=1, config.h:37): vs_baseline = 16.7 / frame_ms (>1 = faster
than the 60 Hz budget).
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

from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.scene import upload

KITTEN = "/root/reference/data/kitten.obj"


def main():
    draw_count = int(os.environ.get("BENCH_DRAWS", 1_000_000))
    width = int(os.environ.get("BENCH_W", 1920))
    height = int(os.environ.get("BENCH_H", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 5))

    t0 = time.time()
    geometry = cook_or_load([KITTEN], cache_dir=os.path.join(os.path.dirname(__file__), ".cache"))
    draws = synthesize_draws(geometry.meshes.count, draw_count=draw_count)
    scene = upload(geometry, draws)
    print(f"[bench] scene ready in {time.time()-t0:.1f}s: {draw_count} draws, "
          f"{scene.num_meshlets} meshlets, vis slots {scene.meshlet_visibility_count}", file=sys.stderr)

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
    )

    cam = Camera()
    settings = RenderSettings()
    params, sp = frame_mod.make_frame_inputs(cam, settings, cfg)
    state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)

    # warmup: compile + converge visibility state
    t0 = time.time()
    image, fb, state, stats = frame_mod.render_frame(scene, state, params, sp, cfg)
    jax.block_until_ready(image)
    print(f"[bench] first frame (compile) {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    image, fb, state, stats = frame_mod.render_frame(scene, state, params, sp, cfg)
    jax.block_until_ready(image)
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
        image, fb, state, stats = frame_mod.render_frame(scene, state, params, sp, cfg)
    _ = np.asarray(image[:1, :1])  # hard sync (block_until_ready is unreliable here)
    frame_ms = float((time.time() - t0) / frames * 1000)

    covered = int(np.asarray((fb.vis != 0x7FFFFFFF)[::8, ::8].sum()) * 64)
    print(f"[bench] {frame_ms:.2f}ms/frame over {frames} chained frames; covered px ~{covered}", file=sys.stderr)

    if int(os.environ.get("BENCH_SHADOW", 1)):
        # ray-traced sun shadows on the same scene (reference
        # niagara.cpp:1792-1855): two-level BVH (one BLAS for the kitten
        # mesh, TLAS over all instances), host refit, traced at 1/2 res
        from niagara_tpu.ops import shadow as shadow_mod

        t0 = time.time()
        bvh, rt_static = shadow_mod.build_scene_rt(geometry, draws)
        build_s = time.time() - t0
        t0 = time.time()
        bvh = shadow_mod.refit_tlas(rt_static, draws)
        refit_s = time.time() - t0
        bvh = jax.device_put(bvh)
        # chunked mode: the trace dispatches in host-synced rounds (a single
        # 0.5M-ray full-depth program runs ~35s and can trip the pooled
        # chip's program watchdog), with early exit once every ray resolves
        sh_fn = lambda d: shadow_mod.shadow_pass(
            d, bvh,
            sun_direction=sp.sun_direction,
            inverse_view_projection=sp.inverse_view_projection,
            width=width, height=height, scale=2, chunked=True,
        )
        t0 = time.time()
        shimg = sh_fn(fb.depth)
        _ = np.asarray(shimg[:1, :1])
        print(f"[bench] shadow compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(3):
            shimg = sh_fn(fb.depth)
        _ = np.asarray(shimg[:1, :1])
        shadow_ms = (time.time() - t0) / 3 * 1000
        lit = float(np.asarray(shimg[::8, ::8].mean()))
        print(f"[bench] shadow_pass(rt) {shadow_ms:.2f}ms at 1/2 res "
              f"(TLAS build {build_s:.1f}s, refit {refit_s:.2f}s, "
              f"{draw_count} instances, mean lit {lit:.3f})", file=sys.stderr)

    if int(os.environ.get("BENCH_SUNMAP", 1)):
        # rasterized sun shadow map — the TPU-native production path
        # (ops/sunmap.py): render the scene from the sun with the same
        # meshlet pipeline, then PCF depth-compare at full res
        from functools import partial as _partial

        from niagara_tpu.ops import sunmap as sunmap_mod

        sf = sunmap_mod.fit_sun_to_draws(np.asarray(sp.sun_direction), draws)
        build_map = _partial(
            sunmap_mod.build_static_sun_map, scene, sf,
            map_w=2048, map_h=2048,
            cmd_capacity=cfg.cmd_capacity, cluster_capacity=cfg.cluster_capacity,
            # 2048x2048 -> 4096 tiles (13 key bits), so tri capacity is
            # capped at 2^19 to keep the packed (tile, tri) sort key in u32
            tri_capacity=min(cfg.tri_capacity, 1 << 19),
            pair_capacity=cfg.pair_capacity,
            max_groups=cfg.max_groups,
        )
        t0 = time.time()
        smap, sm_drops = build_map()
        _ = np.asarray(smap[:1, :1])
        print(f"[bench] static sun map compile+build {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        smap, sm_drops = build_map()
        _ = np.asarray(smap[:1, :1])
        map_ms = (time.time() - t0) * 1000
        sm_fn = jax.jit(lambda d, m: sunmap_mod.shadow_map_pass(
            d, sf, m, inverse_view_projection=sp.inverse_view_projection,
            width=width, height=height))
        term = sm_fn(fb.depth, smap)
        _ = np.asarray(term[:1, :1])
        t0 = time.time()
        for _ in range(3):
            term = sm_fn(fb.depth, smap)
        _ = np.asarray(term[:1, :1])
        term_ms = (time.time() - t0) / 3 * 1000
        lit = float(np.asarray(term[::8, ::8].mean()))
        print(f"[bench] static sun_map build {map_ms:.1f}ms once (2048x2048, "
              f"dropped {int(sm_drops)}) + per-frame resolve {term_ms:.2f}ms "
              f"at {width}x{height}; mean lit {lit:.3f}", file=sys.stderr)

    print(json.dumps({
        "metric": f"kitten_{draw_count//1000}k_draws_{width}x{height}_frame_time",
        "value": round(frame_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.7 / frame_ms, 4),
    }))


if __name__ == "__main__":
    main()
