"""Frame orchestrator: the whole frame as one XLA program.

Reference frame loop (niagara.cpp:1530-1928, SURVEY.md §3.2):
  early cull -> early render -> depth pyramid -> late cull (occlusion)
  -> late render (occlusion + visibility write-back) -> shade/composite.

Here that entire sequence is a single jitted function over carried state
(`FrameState` holds the persistent dvb/mvb visibility buffers, like the
reference's cross-frame GPU buffers).  The CPU never sees intermediate
counts — exactly like the reference's indirect-command design, where the
host never reads back culling results.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bloom, cull, pyramid, raster, shade
from ..utils import math3d
from .camera import Camera, RenderSettings, make_cull_params


@jax.tree_util.register_dataclass
@dataclass
class FrameState:
    """Persistent cross-frame visibility state (reference dvb niagara.cpp:1062,
    mvb :1077-1082)."""

    draw_vis: Any  # i32 [D]
    vis_words: Any  # u32 [ceil(slots/32)]


@dataclass(frozen=True)
class FrameConfig:
    """Static frame-pipeline configuration (array capacities & resolution).

    Capacities bound the compacted arrays, mirroring the reference's
    TASK_WGLIMIT / CLUSTER_LIMIT overflow-drop design (config.h:24-28)."""

    width: int = 1920
    height: int = 1080
    max_groups: int = 8  # max task commands per draw = ceil(max meshlets/64)
    cmd_capacity: int = 1 << 14
    cluster_capacity: int = 1 << 16
    small_capacity: int = 1 << 20
    big_capacity: int = 512
    occlusion_two_pass: bool = True
    bloom: bool = True

    @property
    def pyramid_levels_shape(self):
        return pyramid.pyramid_shape(self.width, self.height)


@jax.tree_util.register_dataclass
@dataclass
class ShadeParams:
    camera_position: Any  # f32 [3]
    sun_direction: Any  # f32 [3]
    inverse_view_projection: Any  # f32 [4,4]


@jax.tree_util.register_dataclass
@dataclass
class FrameStats:
    """Per-frame statistics (role of the reference's pipeline queries + HUD,
    niagara.cpp:1960-2010)."""

    early_commands: Any
    late_commands: Any
    early_clusters: Any
    late_clusters: Any
    visible_draws: Any


def init_state(num_draws: int, vis_slot_count: int) -> FrameState:
    """First-frame state: everything invisible (reference one-time clear of
    dvb/mvb, niagara.cpp:1455-1468)."""
    return FrameState(
        draw_vis=jnp.zeros(num_draws, dtype=jnp.int32),
        vis_words=jnp.zeros((max(vis_slot_count, 64) + 31) // 32, dtype=jnp.uint32),
    )


def _render_pass(scene, params, cmds, state_vis_words, atlas, cfg: FrameConfig, *, late: bool, pyr_hw):
    """clustercull + raster for one pass; returns (clusters, tc, new words)."""
    ccmd, clane, ccount, new_words = cull.cluster_cull(
        scene,
        params,
        cmds,
        state_vis_words,
        atlas,
        late=late,
        pyramid_shape=pyr_hw,
        cluster_capacity=cfg.cluster_capacity,
    )
    tc = raster.transform_clusters(
        scene, ccmd, clane, ccount, cmds, params.view, params.p00, params.p11, params.znear, cfg.width, cfg.height
    )
    return ccount, tc, new_words


def frame_core(scene, state: FrameState, params, cfg: FrameConfig, frag_offset: int = 0):
    """Cull + raster for one frame (everything except shading).

    Returns (fb, tc, new_state, stats).  `frag_offset` shifts fragment ids,
    which lets multi-chip compositing give every device a disjoint id range.
    """
    levels, ph, pw = cfg.pyramid_levels_shape
    pyr_hw = (ph, pw)
    empty_atlas = jnp.zeros((levels, ph, pw), dtype=jnp.float32)

    # --- early pass: frustum-cull, render last-frame-visible ---
    emit_e, lod_e, _ = cull.draw_cull(
        scene, params, state.draw_vis, empty_atlas, late=False, pyramid_shape=pyr_hw
    )
    cmds_e = cull.build_task_commands(
        scene, emit_e, lod_e, state.draw_vis, max_groups=cfg.max_groups, capacity=cfg.cmd_capacity
    )
    ccount_e, tc_e, _ = _render_pass(
        scene, params, cmds_e, state.vis_words, empty_atlas, cfg, late=False, pyr_hw=pyr_hw
    )
    st_e = raster.setup_triangles(tc_e, cfg.width, cfg.height, params.znear)
    fb = raster.rasterize(
        st_e, cfg.width, cfg.height,
        small_capacity=cfg.small_capacity, big_capacity=cfg.big_capacity,
        frag_offset=frag_offset,
    )

    if cfg.occlusion_two_pass:
        # --- depth pyramid from the early pass ---
        atlas = pyramid.build_pyramid(fb.depth, levels, ph, pw)

        # --- late pass: full cull with occlusion, visibility write-back ---
        emit_l, lod_l, new_draw_vis = cull.draw_cull(
            scene, params, state.draw_vis, atlas, late=True, pyramid_shape=pyr_hw
        )
        cmds_l = cull.build_task_commands(
            scene, emit_l, lod_l, state.draw_vis, max_groups=cfg.max_groups, capacity=cfg.cmd_capacity
        )
        ccount_l, tc_l, new_words = _render_pass(
            scene, params, cmds_l, state.vis_words, atlas, cfg, late=True, pyr_hw=pyr_hw
        )
        st_l = raster.setup_triangles(tc_l, cfg.width, cfg.height, params.znear)
        # merge late-pass fragments into the early framebuffer; fragment ids
        # are offset so both passes shade from concatenated cluster arrays
        fb = raster.rasterize_onto(
            fb,
            st_l,
            cfg.width,
            cfg.height,
            frag_offset=frag_offset + cfg.cluster_capacity * 96,
            small_capacity=cfg.small_capacity,
            big_capacity=cfg.big_capacity,
        )
        tc = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), tc_e, tc_l)
        new_state = FrameState(draw_vis=new_draw_vis.astype(jnp.int32), vis_words=new_words)
        stats = FrameStats(
            early_commands=cmds_e.count,
            late_commands=cmds_l.count,
            early_clusters=ccount_e,
            late_clusters=ccount_l,
            visible_draws=jnp.sum(new_draw_vis),
        )
    else:
        tc = tc_e
        new_state = state
        stats = FrameStats(
            early_commands=cmds_e.count,
            late_commands=jnp.int32(0),
            early_clusters=ccount_e,
            late_clusters=jnp.int32(0),
            visible_draws=jnp.sum(emit_e),
        )

    return fb, tc, new_state, stats


@partial(jax.jit, static_argnames=("cfg",))
def render_frame(scene, state: FrameState, params, shade_params: ShadeParams, cfg: FrameConfig):
    """Render one frame.  Returns (image [H,W,3], fb, new_state, stats)."""
    fb, tc, new_state, stats = frame_core(scene, state, params, cfg)

    g0, g1, valid = shade.shade_gbuffer(fb, tc, scene, cfg.width, cfg.height)
    bloom_img = None
    if cfg.bloom:
        bloom_half = bloom.compute_bloom(g0, cfg.width, cfg.height)
        bloom_img = bloom.sample_bloom_fullres(bloom_half, cfg.width, cfg.height)
    image = shade.composite(
        g0,
        g1,
        fb.depth,
        valid,
        camera_position=shade_params.camera_position,
        sun_direction=shade_params.sun_direction,
        inverse_view_projection=shade_params.inverse_view_projection,
        bloom=bloom_img,
        width=cfg.width,
        height=cfg.height,
    )
    return image, fb, new_state, stats


def make_frame_inputs(camera: Camera, settings: RenderSettings, cfg: FrameConfig, sun_direction=None):
    """Host-side per-frame constants: (CullParams, ShadeParams)."""
    _, ph, pw = cfg.pyramid_levels_shape
    params, projection = make_cull_params(camera, cfg.width, cfg.height, pw, ph, settings)
    view = np.asarray(params.view)
    vp = projection @ view
    inv_vp = np.linalg.inv(vp).astype(np.float32)
    if sun_direction is None:
        sun_direction = math3d.normalize(np.array([1.0, 1.0, 1.0], dtype=np.float32))
    sp = ShadeParams(
        camera_position=np.asarray(camera.position, dtype=np.float32),
        sun_direction=np.asarray(sun_direction, dtype=np.float32),
        inverse_view_projection=inv_vp,
    )
    return params, sp
