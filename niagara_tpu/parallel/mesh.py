"""Multi-chip rendering: draw-sharded culling + sort-last image compositing.

The reference is strictly single-GPU (SURVEY.md §2d); scaling it out on TPU
uses the natural decomposition of the GPU-driven pipeline:

* **Draw shard (data parallel):** each device owns a slice of the draw list
  (with its own dvb/mvb visibility state) and runs the full cull -> raster
  cascade for its draws at full resolution — the culling cascade is
  embarrassingly parallel over draws.
* **Sort-last compositing over ICI:** per-device framebuffers are merged
  with two all-reduces: max over reverse-Z depth, then min over fragment id
  among exact-depth winners.  Fragment ids carry a per-device offset so the
  (device, fragment) winner is globally unique and the merge is
  deterministic — the same two-pass protocol the single-chip rasterizer uses
  for its scatter merge, lifted to the mesh axis.
* **Owner shading:** each device shades only pixels whose winning fragment
  it owns (it alone has that cluster's attributes), then a psum assembles
  the image.

Communication: 3 all-reduces of [H,W] buffers per frame, riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bloom, shade
from ..ops.raster import INVALID_FRAG, Framebuffer
from ..render import frame as frame_mod
from ..scene import DeviceScene, Draws, upload


def shard_draws(geometry, draws: Draws, n_shards: int, materials=None):
    """Split the draw list round-robin and build one DeviceScene per shard,
    each with locally-computed visibility offsets.  Returns stacked arrays
    [n_shards, ...] ready for a 'draws' mesh axis."""
    scenes = []
    for s in range(n_shards):
        sl = slice(s, None, n_shards)
        shard = Draws(
            position=draws.position[sl].copy(),
            scale=draws.scale[sl].copy(),
            orientation=draws.orientation[sl].copy(),
            mesh_index=draws.mesh_index[sl].copy(),
            meshlet_visibility_offset=draws.meshlet_visibility_offset[sl].copy(),
            post_pass=draws.post_pass[sl].copy(),
            material_index=draws.material_index[sl].copy(),
        )
        scenes.append(upload(geometry, shard, materials))
    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *scenes)
    # meshlet_visibility_count is static metadata: take the max so every
    # shard's state buffer has one common (padded) size
    vis_count = max(s.meshlet_visibility_count for s in scenes)
    stacked.meshlet_visibility_count = vis_count
    return stacked


def init_sharded_state(stacked_scene, n_shards: int):
    num_draws = stacked_scene.draw_scale.shape[1]
    states = [frame_mod.init_state(num_draws, stacked_scene.meshlet_visibility_count) for _ in range(n_shards)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def make_sharded_frame(mesh: Mesh, cfg: frame_mod.FrameConfig, axis: str = "draws"):
    """Build the jitted multi-chip frame function over `mesh`.

    Returns fn(stacked_scene, stacked_state, params, shade_params, textures,
    shadow_ctx) -> (image [H,W,3] replicated, new stacked_state, stats
    summed).  `textures` (render.textures.TextureTable, replicated on every
    device) is optional — pass None for untextured scenes.  `shadow_ctx` is
    the same sun-map tuple render_frame takes ((sf, map) or (sf, packed,
    shape)) and enables composited sun shadows when cfg.shadows is set.

    The sharded frame is the FULL frame: after the sort-last G-buffer merge
    (psum of disjoint owner pixels), bloom and the sun-map shadow resolve
    run as replicated dense passes on every device — they are image-space
    work orders of magnitude below the sharded cull/raster stages.
    """
    # Fragment ids within one device span [0, tri_capacity) for the early
    # pass plus [tri_capacity + g*late_tri_cap, ...) for each late class
    # GROUP on the merged direct path, or [tri_capacity + pp*late_tri_cap)
    # for pp in 0..post_passes-1 on the legacy wavefront path — see
    # frame_core's frag_offset math.  The stride takes the max of both
    # paths' spans so per-device id ranges stay disjoint for EVERY
    # FrameConfig (the legacy path runs post_passes-1 sequential post
    # passes after its late pass, one late_tri_cap block each).
    late_blocks = max(len(cfg.late_class_groups), cfg.post_passes)
    frag_stride = cfg.tri_capacity + late_blocks * cfg.late_tri_cap

    def per_device(scene, state, params, sp, textures, shadow_ctx):
        # shard_map passes [1, ...] blocks along the draw axis
        scene = jax.tree.map(lambda a: a[0], scene)
        state = jax.tree.map(lambda a: a[0], state)

        dev = jax.lax.axis_index(axis).astype(jnp.int32)
        offset = dev * frag_stride

        fb, tc, setup_all, new_state, stats, attrs_img, trans = frame_mod.frame_core(
            scene, state, params, cfg, frag_offset=offset
        )

        # ---- sort-last composite over ICI ----
        gdepth = jax.lax.pmax(fb.depth, axis)
        winner = (fb.depth == gdepth) & (fb.vis != INVALID_FRAG)
        cand = jnp.where(winner, fb.vis, INVALID_FRAG)
        gvis = jax.lax.pmin(cand, axis)
        mine = winner & (gvis == fb.vis)

        # shade owned pixels, then merge the disjoint owner G-buffers so
        # every device holds the full planes (non-owned pixels shade to
        # zero, so psum is a union).  The tile path shades from the dense
        # per-pixel attribute planes the Pallas shade kernel already built
        # — at an owned pixel the LOCAL winner IS the global winner, so the
        # local attrs are exactly the right ones (no per-pixel record
        # gather, the fast path the single-chip frame uses); the
        # scatter-merge fallback keeps the record-gather shade.
        if attrs_img is not None:
            g0, g1, valid = shade.gbuffer_from_attrs(
                attrs_img, mine, scene, textures=textures, depth=gdepth,
                inverse_view_projection=sp.inverse_view_projection,
            )
        else:
            local_vis = jnp.where(mine, fb.vis - offset, INVALID_FRAG)
            local_fb = Framebuffer(depth=gdepth, vis=local_vis)
            g0, g1, valid = shade.shade_gbuffer(
                local_fb, tc, setup_all, scene, cfg.width, cfg.height, textures=textures
            )
        # pack to the reference's G-buffer encodings (rgba8 + a2bgr10 —
        # shade.pack_gbuffer) before the reduce: 2 i32 planes (8 B/px,
        # valid rides a spare bit) instead of 8 f32 channels + a valid
        # plane (36 B/px).  Owner pixels are disjoint and non-owners pack
        # to 0, so the psum is an exact bitwise union.
        p0, p1 = shade.pack_gbuffer(g0, g1, valid)
        p0 = jax.lax.psum(p0, axis)
        p1 = jax.lax.psum(p1, axis)
        g0, g1, gvalid = shade.unpack_gbuffer(p0, p1)

        # transmission layer (postPass=2): its own sort-last merge — the
        # front-most transmission fragment across devices wins, its owner
        # shades it, and composite blends the merged layer
        transmission = None
        if trans is not None:
            t_depth = jax.lax.pmax(trans["depth"], axis)
            t_winner = (trans["depth"] == t_depth) & (trans["vis"] != INVALID_FRAG)
            t_cand = jnp.where(t_winner, trans["vis"], INVALID_FRAG)
            t_gvis = jax.lax.pmin(t_cand, axis)
            t_mine = t_winner & (t_gvis == trans["vis"])
            g0t, g1t, t_valid = shade.gbuffer_from_attrs(
                trans["attrs"], t_mine, scene, textures=textures, depth=t_depth,
                inverse_view_projection=sp.inverse_view_projection,
            )
            p0t, p1t = shade.pack_gbuffer(g0t, g1t, t_valid)
            p0t = jax.lax.psum(p0t, axis)
            p1t = jax.lax.psum(p1t, axis)
            g0t, g1t, t_gvalid = shade.unpack_gbuffer(p0t, p1t)
            transmission = (g0t, g1t, t_depth, t_gvalid)

        # post stages run replicated on the merged planes — the full frame
        # on every chip (bloom + shadows are dense image passes, far below
        # the sharded cull/raster cost)
        bloom_img = None
        if cfg.bloom:
            bloom_half = bloom.compute_bloom(g0, cfg.width, cfg.height)
            bloom_img = bloom.sample_bloom_fullres(bloom_half, cfg.width, cfg.height)
        shadow_img = None
        if cfg.shadows and shadow_ctx is not None:
            from ..ops import sunmap as sunmap_mod

            if len(shadow_ctx) == 3:
                sf, packed, map_shape = shadow_ctx
                shadow_img = sunmap_mod.shadow_map_pass(
                    gdepth, sf, None,
                    inverse_view_projection=sp.inverse_view_projection,
                    width=cfg.width, height=cfg.height,
                    packed=packed, map_shape=map_shape,
                    blur=cfg.shadow_blur, znear=params.znear,
                )
            else:
                sf, smap = shadow_ctx
                shadow_img = sunmap_mod.shadow_map_pass(
                    gdepth, sf, smap,
                    inverse_view_projection=sp.inverse_view_projection,
                    width=cfg.width, height=cfg.height,
                    blur=cfg.shadow_blur, znear=params.znear,
                )
        image = shade.composite(
            g0,
            g1,
            gdepth,
            gvalid,
            camera_position=sp.camera_position,
            sun_direction=sp.sun_direction,
            inverse_view_projection=sp.inverse_view_projection,
            shadow=shadow_img,
            bloom=bloom_img,
            width=cfg.width,
            height=cfg.height,
            transmission=transmission,
        )

        stats = jax.tree.map(lambda s: jax.lax.psum(s, axis), stats)
        new_state = jax.tree.map(lambda a: a[None], new_state)
        return image, new_state, stats

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def fn(stacked_scene, stacked_state, params, sp, textures=None, shadow_ctx=None):
        return jitted(stacked_scene, stacked_state, params, sp, textures, shadow_ctx)

    return fn


def allreduce_bytes_per_frame(cfg: frame_mod.FrameConfig, transmission: bool = False) -> int:
    """Per-device ICI all-reduce traffic of one sharded frame (for roofline
    accounting; all buffers are [H, W]-shaped f32/i32):

      depth pmax (4B) + vis pmin (4B) + packed-G-buffer p0/p1 psum (4B
      each; rgba8 + a2bgr10 via shade.pack_gbuffer, valid rides a spare
      bit — the reference's actual storage encodings, mesh.frag.glsl:85-86)
      = 16 B/pixel, doubled when a transmission layer is merged.

    At 1080p that is ~33 MB/frame — v5e ICI moves ~45 GB/s/link each way,
    so the composite costs well under a ms/frame/link, far below the
    sharded cull/raster work it amortizes."""
    per_px = 4 + 4 + 4 + 4
    if transmission:
        per_px *= 2
    return cfg.width * cfg.height * per_px


def make_mesh(n_devices: int, axis: str = "draws") -> Mesh:
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"make_mesh({n_devices}) needs {n_devices} devices but the "
            f"{jax.default_backend()!r} backend only has {len(devices)}; "
            "set XLA_FLAGS=--xla_force_host_platform_device_count and "
            "JAX_PLATFORMS=cpu before JAX initializes to get a virtual mesh"
        )
    return Mesh(np.array(devices[:n_devices]), (axis,))
