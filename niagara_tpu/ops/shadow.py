"""Ray-traced sun shadows.

Reference pipeline (shadow.comp.glsl + shadowfill/shadowblur, driven by
niagara.cpp:1792-1855): full-screen ray query against the TLAS from the
reconstructed world position toward the sun, optional checkerboard (half the
pixels traced, the rest reconstructed), then a depth-aware separable blur.

TPU redesign: the acceleration structure is a *stackless skip-pointer BVH*
(cooker/native/bvh.cpp) over the world-space triangle soup of all draws at
their shadow LOD (the lodRT selection, reference scene.cpp:266-268).
Traversal is one jax.lax.while_loop over packed ray state: every step does a
single 8-float row gather (node), an AABB slab test, and on leaves up to
MAX_LEAF watertight any-hit triangle tests.  Rays are traced at a reduced
resolution with checkerboarding, then upsampled/filled/blurred like the
reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

MAX_LEAF = 8


@jax.tree_util.register_dataclass
@dataclass
class ShadowBVH:
    nodes: Any  # f32 [N, 8] (min3, max3, skip bits, leaf bits)
    tri_v0: Any  # f32 [T, 3] leaf-ordered triangle vertices
    tri_e1: Any  # f32 [T, 3] v1 - v0
    tri_e2: Any  # f32 [T, 3] v2 - v0


def build_scene_bvh(geometry, draws) -> ShadowBVH:
    """World-space triangle soup at each draw's shadow LOD -> BVH.

    Host-side build (numpy + native ck_build_bvh); static scenes build once,
    animated scenes rebuild on change (the reference refits its TLAS the same
    frame-granular way, niagara.cpp:1476-1482)."""
    from ..cooker import bindings
    from ..utils import math3d

    m = geometry.meshes
    positions = geometry.vpos.astype(np.float32)

    soup = []
    for d in range(draws.count):
        mi = int(draws.mesh_index[d])
        lod = int(m.lod_rt[mi])
        off = int(m.lod_index_offset[mi, lod])
        cnt = int(m.lod_index_count[mi, lod])
        idx = geometry.indices[off : off + cnt].astype(np.int64)
        tri = positions[idx].reshape(-1, 3, 3)
        world = (
            math3d.rotate_quat(tri.reshape(-1, 3), draws.orientation[d]) * draws.scale[d]
            + draws.position[d]
        ).reshape(-1, 3, 3)
        soup.append(world)

    tris = np.concatenate(soup, axis=0) if soup else np.zeros((0, 3, 3), np.float32)
    flat = tris.reshape(-1, 3).astype(np.float32)
    indices = np.arange(len(flat), dtype=np.uint32)
    nodes, order = bindings.build_bvh(flat, indices)

    ordered = tris[order]
    return ShadowBVH(
        nodes=nodes.astype(np.float32),
        tri_v0=ordered[:, 0].astype(np.float32),
        tri_e1=(ordered[:, 1] - ordered[:, 0]).astype(np.float32),
        tri_e2=(ordered[:, 2] - ordered[:, 0]).astype(np.float32),
    )


def trace_any_hit(bvh: ShadowBVH, origin, direction, t_min=1e-3, t_max=1e30, max_steps=512):
    """Any-hit occlusion test for a batch of rays.

    origin/direction: [N,3].  Returns occluded [N] bool.  The while_loop runs
    until every ray terminates (hit or walked off the tree) or max_steps.
    """
    n_nodes = bvh.nodes.shape[0]
    N = origin.shape[0]

    inv_dir = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)

    nodes = bvh.nodes
    skip_i = jax.lax.bitcast_convert_type(nodes[:, 6], jnp.int32)
    leaf_i = jax.lax.bitcast_convert_type(nodes[:, 7], jnp.int32)

    def cond(state):
        ptr, hit, steps = state
        return jnp.logical_and(jnp.any((ptr < n_nodes) & ~hit), steps < max_steps)

    def body(state):
        ptr, hit, steps = state
        p = jnp.clip(ptr, 0, n_nodes - 1)
        node = nodes[p]  # [N, 8] row gather

        # slab test
        t0 = (node[:, 0:3] - origin) * inv_dir
        t1 = (node[:, 3:6] - origin) * inv_dir
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        tnear = jnp.maximum(jnp.max(tn, axis=-1), t_min)
        tfar = jnp.minimum(jnp.min(tf, axis=-1), t_max)
        box_hit = tnear <= tfar

        leaf = leaf_i[p]
        skip = skip_i[p]
        is_leaf = leaf >= 0

        # leaf: test up to MAX_LEAF triangles (Moller-Trumbore any-hit)
        first = jnp.where(is_leaf, leaf >> 4, 0)
        count = jnp.where(is_leaf & box_hit, leaf & 15, 0)
        tri_hit = jnp.zeros(N, dtype=bool)
        for j in range(MAX_LEAF):
            ti = jnp.clip(first + j, 0, bvh.tri_v0.shape[0] - 1)
            active = j < count
            v0 = bvh.tri_v0[ti]
            e1 = bvh.tri_e1[ti]
            e2 = bvh.tri_e2[ti]
            pvec = jnp.cross(direction, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
            tvec = origin - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(direction * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            ok = active & (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < t_max)
            tri_hit = tri_hit | ok

        new_hit = hit | (box_hit & tri_hit)
        # advance: hit internal -> i+1; leaf or miss -> skip (leaf skip == i+1)
        descend = box_hit & ~is_leaf
        new_ptr = jnp.where(descend, p + 1, skip)
        new_ptr = jnp.where(hit, ptr, new_ptr)  # finished rays stay put
        return new_ptr, new_hit, steps + 1

    ptr0 = jnp.zeros(N, dtype=jnp.int32)
    hit0 = jnp.zeros(N, dtype=bool)
    ptr, hit, _ = jax.lax.while_loop(cond, body, (ptr0, hit0, jnp.int32(0)))
    return hit


def shadow_pass(
    depth,
    bvh: ShadowBVH,
    *,
    sun_direction,
    inverse_view_projection,
    width: int,
    height: int,
    scale: int = 2,
    checkerboard: bool = True,
):
    """Full shadow pipeline: trace at reduced resolution (+checkerboard),
    reconstruct, upsample to [H,W] shadow term in [0,1]."""
    sw, sh = width // scale, height // scale

    # reconstruct world positions at low-res pixel centers
    px = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / sw
    py = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / sh
    d_small = depth[:: scale, :: scale][:sh, :sw]

    ndc_x = px[None, :] * 2 - 1
    ndc_y = 1 - py[:, None] * 2
    clip = jnp.stack(
        [
            jnp.broadcast_to(ndc_x, (sh, sw)),
            jnp.broadcast_to(ndc_y, (sh, sw)),
            d_small,
            jnp.ones((sh, sw), jnp.float32),
        ],
        axis=-1,
    )
    wposh = clip @ inverse_view_projection.T
    wpos = wposh[..., :3] / jnp.where(jnp.abs(wposh[..., 3:]) < 1e-20, 1e-20, wposh[..., 3:])

    valid = d_small > 0.0

    if checkerboard:
        # trace only pixels where (x+y) is even (reference shadow.comp
        # checkerboard: half the columns, :129-134)
        cb = ((jnp.arange(sh)[:, None] + jnp.arange(sw)[None, :]) % 2) == 0
        trace_mask = valid & cb
    else:
        trace_mask = valid

    origins = wpos.reshape(-1, 3)
    dirs = jnp.broadcast_to(sun_direction, origins.shape)
    occluded = trace_any_hit(bvh, origins, dirs)
    occluded = occluded.reshape(sh, sw)

    shadow = jnp.where(occluded, 0.0, 1.0)
    shadow = jnp.where(valid, shadow, 1.0)

    if checkerboard:
        # reconstruct skipped pixels from traced neighbors (shadowfill.comp)
        left = jnp.roll(shadow, 1, axis=1)
        right = jnp.roll(shadow, -1, axis=1)
        up = jnp.roll(shadow, 1, axis=0)
        down = jnp.roll(shadow, -1, axis=0)
        avg = (left + right + up + down) * 0.25
        cb = ((jnp.arange(sh)[:, None] + jnp.arange(sw)[None, :]) % 2) == 0
        shadow = jnp.where(cb, shadow, avg)

    # separable blur (shadowblur.comp, simplified gaussian)
    kernel = jnp.array([0.25, 0.5, 0.25])
    for axis in (0, 1):
        acc = shadow * kernel[1]
        acc = acc + jnp.roll(shadow, 1, axis=axis) * kernel[0]
        acc = acc + jnp.roll(shadow, -1, axis=axis) * kernel[2]
        shadow = acc

    # nearest upsample to full res
    shadow_full = jnp.repeat(jnp.repeat(shadow, scale, axis=0), scale, axis=1)
    return shadow_full[:height, :width]
