"""Compiled-vs-interpret Pallas parity gate.

The engine's three Pallas kernels (ops/setup_fused.py, ops/raster_tile.py
raster + shade) are pinned by the CPU test suite in INTERPRETER mode; the
Mosaic-compiled lowerings that actually run on the chip were previously
exercised only through bench statistics.  The kernels leans on exactness
arguments (bf16-split matmul reconstruction, one-hot MXU gathers,
f32 integer carries) that a lowering divergence would silently break —
VERDICT r3 weak #5.

`mosaic_parity_check` runs the full kernel chain twice on identical inputs
— once Mosaic-compiled, once interpreted (lowered to plain XLA ops on the
same chip) — and asserts BIT-IDENTICAL outputs: setup records and counts,
raster depth/visibility (opaque and alpha-test variants), and shade
attribute planes.  bench.py calls it in its preamble so every recorded
benchmark certifies the lowering it ran on.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import cull, raster, raster_tile, setup_fused
from . import frame as frame_mod
from .camera import Camera, RenderSettings


def mosaic_parity_check(geometry, *, width: int = 256, height: int = 128,
                        draws_n: int = 256, with_alpha: bool = True,
                        verbose: bool = False) -> dict:
    """Assert the Mosaic-compiled kernels match their interpreted semantics
    bit-for-bit on a small scene.  Returns per-stage match stats; raises
    AssertionError on any divergence."""
    from ..cooker import synth
    from ..cooker.opacity import bake_opacity
    from ..scene import upload

    draws = synth.synthesize_draws(geometry.meshes.count, draw_count=draws_n,
                                   scene_radius=12.0)
    masks = None
    if with_alpha:
        # deep-copy before synthesizing uvs: the parity fixture must not
        # mutate the CALLER's cooked geometry (bench.py reuses it for the
        # headline scene — enabling/disabling the parity gate would
        # otherwise change the headline's vertex uv data)
        import copy

        geometry = copy.deepcopy(geometry)
        synth.synthesize_planar_uvs(geometry)
        materials, texture_mips, mat_idx, post = synth.synthesize_materials(draws_n)
        draws.material_index[:] = mat_idx
        draws.post_pass[:] = post
        masks = bake_opacity(geometry, draws, materials, texture_mips)
        scene = upload(geometry, draws, materials, masks)
    else:
        scene = upload(geometry, draws)
    scene = jax.device_put(scene)

    cap = 1 << 12
    cfg = frame_mod.FrameConfig(
        width=width, height=height, max_groups=8,
        cmd_capacity=1 << 10, cluster_capacity=cap,
        pair_capacity=1 << 14, tri_capacity=1 << 13,
    )
    params, _ = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg)
    levels, ph, pw = cfg.pyramid_levels_shape
    atlas = jnp.zeros((levels, ph, pw), jnp.float32)
    dvb = jnp.ones(scene.num_draws, dtype=jnp.int32)
    words = jnp.full(
        frame_mod.init_state(scene.num_draws, scene.meshlet_visibility_count).vis_words.shape,
        0xFFFFFFFF, dtype=jnp.uint32,
    )

    # shared XLA front half: cull + expansion (identical for both runs)
    emit, lod, _ = cull.draw_cull(scene, params, dvb, atlas, late=False,
                                  pyramid_shape=(ph, pw))
    cdraw, cmi, ccount, _, _, _, _ = cull.cluster_cull_direct(
        scene, params, emit, lod, dvb, words, atlas,
        late=False, pyramid_shape=(ph, pw),
        draw_capacity=cfg.cmd_capacity, cluster_capacity=cap,
    )
    tc = raster.transform_meta_direct(scene, cdraw, cmi, ccount)

    stats = {}

    def run(interpret: bool):
        st = setup_fused.setup_compact(tc, params, width, height,
                                       cfg.tri_capacity, interpret=interpret)
        tiles_x = width // raster_tile.TILE_W
        tiles_y = height // raster_tile.TILE_H
        n_tiles = tiles_x * tiles_y
        out = {"count": st["count"], "rec48": st["rec48"]}
        for variant, alpha in (("opaque", False), ("alpha", True)):
            depth_t = jnp.zeros((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
            vis_t = jnp.full((n_tiles, raster_tile.TILE_H, raster_tile.TILE_W),
                             raster.INVALID_FRAG, jnp.int32)
            depth_t, vis_t, rst = raster_tile.rasterize_tiles(
                st, depth_t, vis_t, tiles_x=tiles_x, tiles_y=tiles_y,
                pair_capacity=cfg.pair_capacity, interpret=interpret,
                alpha_test=alpha,
            )
            out[f"depth_{variant}"] = depth_t
            out[f"vis_{variant}"] = vis_t
            if not alpha:
                attr_t = jnp.zeros(
                    (n_tiles, raster_tile.ATTR_CHANNELS, raster_tile.TILE_H,
                     raster_tile.TILE_W), jnp.float32)
                out["attrs"] = raster_tile.shade_tiles(
                    rst["stream"], vis_t, attr_t, tiles_x=tiles_x,
                    interpret=interpret)
        return out

    # jit both variants: the fused setup kernel pins small inputs to VMEM
    # via with_memory_space_constraint, which cannot run eagerly
    compiled = jax.tree.map(np.asarray, jax.jit(lambda: run(False))())
    interp = jax.tree.map(np.asarray, jax.jit(lambda: run(True))())

    n = int(compiled["count"])
    assert n == int(interp["count"]), (
        f"setup count diverged: compiled {n} vs interpreted {int(interp['count'])}"
    )
    assert n > 0, "parity scene rendered nothing — scene/camera broke"
    rec_cols = setup_fused.REC  # cols beyond REC are uninitialized scratch
    checks = {
        "setup_records": (compiled["rec48"][:n, :rec_cols], interp["rec48"][:n, :rec_cols]),
        "raster_depth": (compiled["depth_opaque"], interp["depth_opaque"]),
        "raster_vis": (compiled["vis_opaque"], interp["vis_opaque"]),
        "raster_depth_alpha": (compiled["depth_alpha"], interp["depth_alpha"]),
        "raster_vis_alpha": (compiled["vis_alpha"], interp["vis_alpha"]),
        "shade_attrs": (compiled["attrs"], interp["attrs"]),
    }
    for name, (a, b) in checks.items():
        same = np.array_equal(a, b)
        stats[name] = "exact" if same else "DIVERGED"
        if not same:
            d = np.abs(a.astype(np.float64) - b.astype(np.float64))
            raise AssertionError(
                f"Mosaic parity FAILED at {name}: {int((d > 0).sum())} of "
                f"{d.size} values differ, max |diff| {d.max():.3e}"
            )
    stats["setup_records_live"] = n
    covered = int((compiled["vis_opaque"] != raster.INVALID_FRAG).sum())
    assert covered > 100, f"parity scene covered only {covered} px"
    stats["covered_px"] = covered
    if verbose:
        print(f"[parity] {stats}")
    return stats
