#!/usr/bin/env python
"""Offline renderer: render frames of a scene to PNG images.

The headless analog of the reference's interactive window — renders the
synthetic kitten scene (or a .gltf/.obj) with the full pipeline and writes
frame_NNN.png plus a HUD overlay with frame stats.

Usage:
  python tools/render_scene.py [scene.gltf|scene.obj ...] \
      [--draws N] [--frames N] [--size WxH] [--out DIR] [--orbit]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# honor JAX_PLATFORMS=cpu even though the axon TPU plugin registers at
# interpreter start and would otherwise win
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from niagara_tpu.cooker.cook import cook_or_load
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.render import frame as frame_mod, hud
from niagara_tpu.render.camera import Camera, RenderSettings, load_camera, save_camera
from niagara_tpu.scene import upload
from niagara_tpu.utils import math3d
from niagara_tpu.utils.profiling import FrameProfiler
from niagara_tpu.utils.png import write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="*", default=["/root/reference/data/kitten.obj"])
    ap.add_argument("--draws", type=int, default=10000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--out", default="/tmp/niagara_frames")
    ap.add_argument("--orbit", action="store_true", help="orbit the camera around the scene")
    ap.add_argument("--camera", default=None, help="camera persistence file (.camera.json)")
    ap.add_argument("--shadows", action="store_true", help="ray-traced sun shadows (scenes <= 200k world tris)")
    ap.add_argument("--debug", default=None, choices=["meshlet", "draw", "depth"], help="debug visualization mode")
    ap.add_argument(
        "--config", type=int, default=None, choices=range(6),
        help="staged benchmark config preset (render/presets.py): 0 classic "
        "no-culling, 1 frustum/cone/LOD, 2 two-pass occlusion, 3 textured, "
        "4/5 animation + sun shadows",
    )
    ap.add_argument("--downsample", type=int, default=1, help="downscale output PNGs by N (D2H is slow here)")
    ap.add_argument(
        "--watch",
        action="store_true",
        help="hot-iteration loop (reference R-key shader reload, niagara.cpp:"
        "1253-1288): watch the kernel sources + scene files and re-render on "
        "every change; a failed reload keeps the last good frame",
    )
    args = ap.parse_args()

    if args.watch:
        return watch_loop(args)

    width, height = map(int, args.size.split("x"))
    os.makedirs(args.out, exist_ok=True)

    textures = None
    texture_mips = None
    if args.scene[0].endswith((".gltf", ".glb")):
        from niagara_tpu.cooker import gltf
        from niagara_tpu.render import textures as tex_mod

        sd = gltf.load_scene(args.scene[0])
        geometry, draws, materials = sd.geometry, sd.draws, sd.materials
        if sd.texture_paths:
            base = os.path.dirname(os.path.abspath(args.scene[0]))
            texture_mips = tex_mod.load_texture_mips(sd.texture_paths, base_dir=base)
            textures = jax.device_put(tex_mod.build_texture_table(mips=texture_mips))
            print(f"texture table: {len(sd.texture_paths)} textures, "
                  f"{textures.texels.shape[0] * 4 / 1e6:.1f} MB texels")
        cam = Camera()
        if sd.camera_position is not None:
            cam = Camera(position=sd.camera_position, orientation=sd.camera_orientation, fov_y=sd.camera_fov_y)
        sun = sd.sun_direction
    else:
        geometry = cook_or_load(args.scene, cache_dir="/root/repo/.cache")
        draws = synthesize_draws(geometry.meshes.count, draw_count=args.draws)
        materials = None
        cam = Camera()
        sun = None

    if args.camera and os.path.exists(args.camera):
        cam = load_camera(args.camera)
        print(f"loaded camera from {args.camera}")

    bvh = None
    if args.shadows:
        from niagara_tpu.ops import shadow as shadow_mod

        bvh, _ = shadow_mod.build_scene_rt(geometry, draws, materials, texture_mips)
        bvh = jax.device_put(bvh)
        print(f"shadow BVH: {bvh.nodes.shape[0]} nodes, {bvh.tri_v0.shape[0]} tris")

    alpha_masks = None
    if texture_mips is not None:
        from niagara_tpu.cooker.opacity import bake_opacity

        alpha_masks = bake_opacity(geometry, draws, materials, texture_mips)
        if alpha_masks is not None:
            n_alpha = int((alpha_masks[..., 6] > 0).sum())
            print(f"opacity bake: {n_alpha} alpha-tested triangles masked")

    scene = jax.device_put(upload(geometry, draws, materials, alpha_masks, texture_table=textures))

    cfg = frame_mod.FrameConfig(
        width=width,
        height=height,
        max_groups=int(np.ceil(geometry.meshes.lod_meshlet_count.max() / 64)),
        cmd_capacity=1 << 16,
        cluster_capacity=1 << 16,
        pair_capacity=1 << 20,
        late_cluster_capacity=1 << 14,
        late_tri_capacity=1 << 18,
        shadows=args.shadows,
        shadow_quality=1 if (args.shadows and alpha_masks is not None) else 0,
        post_passes=2 if (alpha_masks is not None) else 1,
        raster_interpret=jax.default_backend() == "cpu",
    )
    settings = RenderSettings()
    if args.config is not None:
        from niagara_tpu.render import presets
        import dataclasses as _dc

        ov = presets.frame_overrides(args.config)
        ov.pop("shadows", None)  # shadows need a BVH/sun-map context: --shadows
        cfg = _dc.replace(cfg, **ov)
        settings = presets.settings_for(args.config, settings)
        print(f"config preset {args.config}: {settings}")
    state = frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count)
    prof = FrameProfiler()

    for n in range(args.frames):
        if args.orbit:
            angle = 2 * np.pi * n / max(args.frames, 1)
            cam.orientation = math3d.quat_axis_angle(np.array([0, 1, 0]), angle)

        params, sp = frame_mod.make_frame_inputs(cam, settings, cfg, sun_direction=sun)
        prof.begin_frame()
        image, fb, state, stats = frame_mod.render_frame(scene, state, params, sp, cfg, bvh=bvh, textures=textures)
        if args.debug:
            from niagara_tpu.ops import shade as shade_mod

            fb2, tc2, setup2, _, _, _, _ = frame_mod.frame_core(scene, state, params, cfg)
            image = shade_mod.debug_visualize(fb2, tc2, setup2, args.debug)
        if args.downsample > 1:
            image = image[:: args.downsample, :: args.downsample]
        img = np.asarray(image)  # device->host sync (slow through the relay)
        ms = prof.end_frame()

        img = np.asarray(
            hud.draw_hud(
                jax.numpy.asarray(img),
                [
                    f"frame {ms:8.2f} ms",
                    f"draws visible {int(stats.visible_draws)}",
                    f"clusters e/l {int(stats.early_clusters)}/{int(stats.late_clusters)}",
                ],
            )
        )
        path = os.path.join(args.out, f"frame_{n:03d}.png")
        write_png(path, img)
        print(f"{path}: {ms:.1f} ms, visible draws {int(stats.visible_draws)}")

    if args.camera:
        save_camera(args.camera, cam)
        print(f"saved camera to {args.camera}")

    if args.frames > 0:
        print(prof.report(stats))


def watch_loop(args):
    """Hot-iteration loop: the TPU analog of the reference's live shader
    reload (`R` key -> ninja -> reload .spv -> recreate pipelines,
    niagara.cpp:1253-1288).  Our "shaders" are the Python/Pallas kernels in
    niagara_tpu/, so each change re-renders in a fresh subprocess (fresh
    imports = recreated pipelines; the persistent XLA compile cache keeps
    warm reloads fast).  A failed render keeps the previous output and shows
    the error — like the reference keeping old pipelines on a red status."""
    import subprocess

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    watch_dirs = [os.path.join(repo, "niagara_tpu")]
    watch_files = [p for p in args.scene if os.path.exists(p)]

    def snapshot():
        stamp = {}
        for d in watch_dirs:
            for root, _, files in os.walk(d):
                for f in files:
                    if f.endswith((".py", ".cpp", ".h")):
                        p = os.path.join(root, f)
                        stamp[p] = os.path.getmtime(p)
        for p in watch_files:
            stamp[p] = os.path.getmtime(p)
        return stamp

    child_args = [sys.executable, os.path.abspath(__file__)]
    for a in sys.argv[1:]:
        if a != "--watch":
            child_args.append(a)
    if "--frames" not in sys.argv:
        child_args += ["--frames", "1"]

    print(f"watch mode: {len(snapshot())} files; Ctrl-C to stop")
    last = snapshot()
    # initial render
    status = "render"
    while True:
        if status == "render":
            t0 = time.time()
            r = subprocess.run(child_args)
            if r.returncode == 0:
                print(f"[watch] OK in {time.time()-t0:.1f}s -> {args.out}")
            else:
                print(f"[watch] FAILED (rc={r.returncode}); keeping last good frames")
            status = "idle"
        time.sleep(1.0)
        now = snapshot()
        changed = [p for p in now if now.get(p) != last.get(p)] + [
            p for p in last if p not in now
        ]
        if changed:
            print(f"[watch] changed: {', '.join(os.path.basename(p) for p in changed[:4])}")
            last = now
            status = "render"


if __name__ == "__main__":
    main()
