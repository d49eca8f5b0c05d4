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


def timed(name, fn, *args, n=3, **kwargs):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:28s} {1000*np.median(ts):9.2f} ms", flush=True)
    return out


def main():
    draws_n = int(os.environ.get("PROF_DRAWS", 100_000))
    width, height = 1920, 1080

    geometry = cook_or_load(["/root/reference/data/kitten.obj"], cache_dir="/root/repo/.cache")
    draws = synthesize_draws(geometry.meshes.count, draw_count=draws_n)
    scene = jax.device_put(upload(geometry, draws))

    cfg = frame_mod.FrameConfig(
        width=width, height=height, max_groups=8,
        cmd_capacity=1 << 16, cluster_capacity=1 << 17,
        small_capacity=1 << 21, big_capacity=512,
    )
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg)
    levels, ph, pw = cfg.pyramid_levels_shape
    pyr_hw = (ph, pw)
    atlas0 = jnp.zeros((levels, ph, pw), dtype=jnp.float32)
    dvb = jnp.ones(scene.num_draws, dtype=jnp.int32)
    vis_words = jnp.zeros((max(scene.meshlet_visibility_count, 64) + 31) // 32, dtype=jnp.uint32)

    dc = partial(jax.jit, static_argnames=("late", "pyramid_shape"))(cull.draw_cull)
    emit, lod, vis = timed("drawcull", dc, scene, params, dvb, atlas0, late=False, pyramid_shape=pyr_hw)

    btc = partial(jax.jit, static_argnames=("max_groups", "capacity"))(cull.build_task_commands)
    cmds = timed("build_task_commands", btc, scene, emit, lod, dvb, max_groups=cfg.max_groups, capacity=cfg.cmd_capacity)

    cc = partial(jax.jit, static_argnames=("late", "pyramid_shape", "cluster_capacity"))(cull.cluster_cull)
    ccmd, clane, ccount, _ = timed(
        "clustercull", cc, scene, params, cmds, vis_words, atlas0,
        late=False, pyramid_shape=pyr_hw, cluster_capacity=cfg.cluster_capacity,
    )
    print(f"{'':28s} [commands={int(cmds.count)} clusters={int(ccount)}]")

    tcf = partial(jax.jit, static_argnames=("width", "height"))(raster.transform_clusters)
    tc = timed("transform_clusters", tcf, scene, ccmd, clane, ccount, cmds, params.view,
               params.p00, params.p11, params.znear, width=cfg.width, height=cfg.height)

    stf = partial(jax.jit, static_argnames=("width", "height"))(
        lambda tc, w, h, zn: raster.setup_triangles(tc, w, h, zn), )
    st = timed("setup_triangles", partial(jax.jit, static_argnames=())(lambda t: raster.setup_triangles(t, cfg.width, cfg.height, 0.1)), tc)
    print(f"{'':28s} [valid tris={int(jnp.sum(st['valid']))}]")

    rz = partial(jax.jit, static_argnames=("width", "height", "small_capacity", "big_capacity"))(raster.rasterize)
    fb = timed("rasterize", rz, st, cfg.width, cfg.height, small_capacity=cfg.small_capacity, big_capacity=cfg.big_capacity)

    pj = partial(jax.jit, static_argnames=("levels", "ph", "pw"))(pyramid.build_pyramid)
    timed("depth_pyramid", pj, fb.depth, levels, ph, pw)

    sg = partial(jax.jit, static_argnames=("width", "height"))(shade.shade_gbuffer)
    g0, g1, valid = timed("shade_gbuffer", sg, fb, tc, scene, width=cfg.width, height=cfg.height)

    co = partial(jax.jit, static_argnames=("width", "height"))(
        lambda g0, g1, d, v, sp: shade.composite(
            g0, g1, d, v,
            camera_position=sp.camera_position, sun_direction=sp.sun_direction,
            inverse_view_projection=sp.inverse_view_projection,
            width=cfg.width, height=cfg.height,
        )
    )
    timed("composite", co, g0, g1, fb.depth, valid, sp)


if __name__ == "__main__":
    main()
