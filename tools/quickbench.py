#!/usr/bin/env python
"""Fast headline-frame timing loop for optimization work.

Measures ONLY the static 1M-draw bench-scope frame (textured + alpha +
sun-map shadows + bloom), skipping the parity gate, probe, glTF, and
animated sections of bench.py.  Prints per-frame ms and the drop counters.

Env: QB_DRAWS (default 1M), QB_FRAMES (default 5), QB_STAGES=1 adds a
per-stage breakdown of frame_core's pieces under one jit each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker.opacity import bake_opacity
from niagara_tpu.cooker import synth
from niagara_tpu.ops import sunmap as sunmap_mod
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render import presets
from niagara_tpu.render import textures as tex_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.scene import upload


def main():
    draw_count = int(os.environ.get("QB_DRAWS", 1_000_000))
    with_shadows = int(os.environ.get("QB_SHADOWS", 1))
    frames = int(os.environ.get("QB_FRAMES", 5))
    width, height = 1920, 1080
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
    table = jax.device_put(table_host)
    print(f"[qb] scene ready {time.time()-t0:.1f}s", file=sys.stderr)

    caps = presets.headline_capacities(draw_count)
    cfg = frame_mod.FrameConfig(
        width=width, height=height,
        max_groups=int(np.ceil(geometry.meshes.lod_meshlet_count.max() / 64)),
        post_passes=2, shadows=bool(with_shadows), **caps,
    )
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg)
    state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)

    shadow_ctx = None
    if with_shadows:
        sf = sunmap_mod.fit_sun_to_draws(np.asarray(sp.sun_direction), draws)
        ext = np.asarray(jax.device_get(sf["hi"] - sf["lo"]))
        texel_world = float(max(ext[0] / map_wh, ext[1] / map_wh))
        sun_caps = dict(
            cmd_capacity=cfg.cmd_capacity, cluster_capacity=cfg.cluster_capacity,
            tri_capacity=min(cfg.tri_capacity, 1 << 19),
            pair_capacity=cfg.pair_capacity, max_groups=cfg.max_groups,
        )
        t0 = time.time()
        smap, sm_drops = sunmap_mod.build_static_sun_map(
            scene, sf, map_w=map_wh, map_h=map_wh, texel_world=texel_world, **sun_caps)
        packed = jax.jit(sunmap_mod.pack_sun_map)(smap)
        _ = np.asarray(packed[:1, :1])
        print(f"[qb] sun map {time.time()-t0:.1f}s dropped={int(sm_drops)}", file=sys.stderr)
        shadow_ctx = (sf, packed, (map_wh, map_wh))

    render = lambda st: frame_mod.render_frame(
        scene, st, params, sp, cfg, bvh=shadow_ctx, textures=table)

    t0 = time.time()
    image, fb, state, stats = render(state)
    _ = np.asarray(image[:1, :1])
    print(f"[qb] compile {time.time()-t0:.1f}s", file=sys.stderr)
    image, fb, state, stats = render(state)
    _ = np.asarray(image[:1, :1])

    if os.environ.get("QB_DROPS"):
        for fi in range(frames):
            image, fb, state, stats = render(state)
            print(f"[qb] frame {fi}: pair={int(stats.pair_dropped)} "
                  f"vec={np.asarray(stats.pair_drop_vec).tolist()} "
                  f"tri={int(stats.tri_dropped)}", file=sys.stderr)

    t0 = time.time()
    for _ in range(frames):
        image, fb, state, stats = render(state)
    _ = np.asarray(image[:1, :1])
    frame_ms = (time.time() - t0) / frames * 1000
    covered = int(np.asarray((fb.vis != 0x7FFFFFFF)[::8, ::8].sum()) * 64)
    print(f"[qb] frame {frame_ms:.2f}ms covered~{covered} "
          f"drops cmd={int(stats.cmd_dropped)} cluster={int(stats.cluster_dropped)} "
          f"tri={int(stats.tri_dropped)} pair={int(stats.pair_dropped)} "
          f"vec={np.asarray(stats.pair_drop_vec).tolist()}")
    print(f"[qb] demand tri={int(stats.tri_count)} pair={int(stats.pair_count)} "
          f"class demand (tiny1/tiny2/small/midA/midB/giant)="
          f"{np.asarray(stats.pair_demand_vec).tolist()}")


if __name__ == "__main__":
    main()
