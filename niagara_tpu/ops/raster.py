"""Software rasterizer — visibility-buffer style, TPU-first.

Replaces the reference's hardware mesh-shading raster path
(meshlet.mesh.glsl + dynamic-rendering G-buffer writes) with a design built
for dense VPU work and minimal scatter:

1. **Cluster vertex transform** [K,64]: gather meshlet vertices, transform to
   clip/screen space (reference meshlet.mesh.glsl:125-162 semantics).
2. **Triangle setup** [K,96]: edge equations, screen-linear depth plane
   (valid because ndc depth = znear/viewz is affine in screen space under
   perspective), backface/zero-area cull (reference meshlet.mesh.glsl:175-197).
3. **Window emission**: each surviving triangle emits 8x8-pixel raster
   windows covering its AABB (up to MAX_SUBWINDOWS; larger triangles go to a
   bounded big-triangle path).  Fixed caps with masked overflow mirror the
   reference's buffer-limit drops.
4. **Fragment evaluation** [W,8,8]: dense edge/depth evaluation per window.
5. **Deterministic z-resolve** into a *visibility buffer*: scatter-max depth,
   then scatter-min fragment id among depth winners.  Equal-depth ties go to
   the smallest fragment id, making the whole raster order-independent —
   stronger determinism than the reference's submission-order HW raster.

Shading then runs as dense per-pixel passes over the visibility buffer
(ops/shade.py), which is exactly the shape of work the VPU wants.

NOTE: the window-emission scatter-merge path here (steps 3-5: emit_windows /
rasterize / rasterize_onto) is **oracle-only** — the production rasterizer is
the Pallas tile kernel (ops/raster_tile.py, FrameConfig.use_tile_raster=True,
the default).  It is kept as an independent XLA-lowered cross-check of the
tile kernel's output (tests/test_raster_tile.py compares the two paths
bit-exactly) and as the interpret-mode-free fallback.  The transform/setup
halves (transform_meta*, compact_setup) remain production code shared by
both paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..config import MESH_MAXTRI, MESH_MAXVTX

# raster window size in pixels (small triangles after 1px-error LOD)
WIN = 8
# small path: dense window emission for triangles spanning <= 2x2 windows
# (~16px); mid path: compacted triangles spanning <= 16x16 windows (128px);
# larger triangles are dropped with a counter (rare under 1px-error LOD)
SMALL_TILES = 2
MID_TILES = 16

INVALID_FRAG = jnp.int32(0x7FFFFFFF)


@jax.tree_util.register_dataclass
@dataclass
class Framebuffer:
    depth: Any  # f32 [H,W], reverse-Z (0 = far/clear)
    vis: Any  # i32 [H,W], fragment id or INVALID_FRAG


def transform_clusters(scene, cluster_cmd, cluster_lane, cluster_count, cmds, view, p00, p11, znear, width, height):
    """Gather + transform the vertices of each visible cluster.

    Returns per-cluster arrays:
      tri_valid  [K,96]  triangle is live (cluster live, tri < count)
      vid        [K,64]  absolute vertex ids (for attribute fetch at shade time)
      sx, sy     [K,64]  screen-space pixel coords (pixel centers at x+0.5)
      zw         [K,64]  ndc depth (znear/viewz)
      inv_w      [K,64]  1/viewz (for perspective-correct interpolation)
      tri        [K,96,3] meshlet-local indices
      draw_id    [K]
      mi         [K]     absolute meshlet ids
    """
    K = cluster_cmd.shape[0]
    k = jnp.arange(K, dtype=jnp.int32)
    live = k < cluster_count

    cmd = cluster_cmd
    draw_id = cmds.draw_id[cmd]
    mi = cmds.task_offset[cmd] + cluster_lane
    mi = jnp.clip(mi, 0, scene.meshlet_vertices.shape[0] - 1)

    vid = scene.meshlet_vertices[mi]  # [K,64]
    tri = scene.meshlet_tris[mi]  # [K,96,3]
    tri_count = scene.meshlet_triangle_count[mi]  # [K]

    # one contiguous 2 KB row per meshlet instead of 64 element gathers
    vdata = scene.meshlet_vdata[mi]  # [K,64,8] (position, object normal, uv)
    pos = vdata[..., 0:3]
    vattr = vdata[..., 3:8]
    xf = scene.draw_xform_row[draw_id]  # [K,8] — one row gather
    q = xf[:, None, 4:8]  # [K,1,4]
    s = xf[:, None, None, 3]
    t = xf[:, None, 0:3]

    qv = q[..., :3]
    qw = q[..., 3:4]
    tmp = jnp.cross(qv, pos) + qw * pos
    world = (pos + 2.0 * jnp.cross(qv, tmp)) * s + t  # [K,64,3]

    # world-space normals baked here so the shading record needs no
    # per-pixel orientation gather
    nrm = vattr[..., :3]
    tmpn = jnp.cross(qv, nrm) + qw * nrm
    world_nrm = nrm + 2.0 * jnp.cross(qv, tmpn)  # [K,64,3]

    cam = world @ view[:3, :3].T + view[:3, 3]  # camera space, z forward
    viewz = cam[..., 2]

    safe_z = jnp.where(jnp.abs(viewz) < 1e-12, 1e-12, viewz)
    zw = znear / safe_z

    # homogeneous pixel coordinates (hx/w, hy/w) = screen position, computed
    # WITHOUT the perspective division so vertices on or behind the near
    # plane stay well-defined; triangle setup (compact_setup) builds edge
    # equations directly from (hx, hy, w) Olano-Greer style, which gives
    # exact near-plane clipping through the per-pixel 0 < z <= 1 depth test
    # (reference relies on HW clipping, meshlet.mesh.glsl:175-197)
    hx = (p00 * cam[..., 0] * 0.5 + 0.5 * viewz) * width
    hy = (0.5 * viewz - p11 * cam[..., 1] * 0.5) * height  # image y down

    # subpixel snap: hardware rasterizers quantize post-viewport vertex
    # positions to a fixed-point grid (Vulkan subPixelPrecisionBits, 8 on
    # the reference's target GPUs) before edge setup, so edges, fill-rule
    # ties, and the depth plane all derive from snapped positions.  Corners
    # in front of the camera snap to the same 1/256 grid here (x256 is an
    # exponent shift — exact; one rounding re-scaling by viewz); corners on
    # or behind the near plane keep raw homogeneous coords (hardware would
    # clip them — divergence is measured in tests/test_raster_oracle.py).
    wpos = viewz > 1e-9
    hx = jnp.where(wpos, jnp.round(hx / safe_z * 256.0) * jnp.float32(1.0 / 256.0) * viewz, hx)
    hy = jnp.where(wpos, jnp.round(hy / safe_z * 256.0) * jnp.float32(1.0 / 256.0) * viewz, hy)

    tri_valid = (
        live[:, None]
        & (jnp.arange(MESH_MAXTRI, dtype=jnp.int32)[None, :] < tri_count[:, None])
    )

    return dict(
        tri_valid=tri_valid,
        vid=vid,
        hx=hx,
        hy=hy,
        zw=zw,
        viewz=viewz,
        normal=world_nrm,
        uv=vattr[..., 3:5],
        tri=tri,
        draw_id=draw_id,
        mat_index=scene.draw_material_index[draw_id],
        post_pass=scene.draw_post_pass[draw_id],
        mi=mi,
    )


def transform_meta(scene, cluster_cmd, cluster_lane, cluster_count, cmds):
    """Light per-cluster metadata for the fused setup kernel
    (setup_fused.py): meshlet index, transform row, ids.  The heavy vertex
    channels, triangle ids, and opacity masks are NOT gathered here — the
    kernel DMAs each live cluster's [16,128] setup row (and, for post
    clusters, its [8,128] opacity row) straight from the scene tables in
    HBM, so no [K, ...] gathered intermediates exist and dead capacity
    slots cost nothing (measured: the gathered form streamed ~1.2 GB/frame
    at bench capacities — ~90 ms of the old transform+setup cost)."""
    cmd = cluster_cmd
    draw_id = cmds.draw_id[cmd]
    mi = cmds.task_offset[cmd] + cluster_lane
    mi = jnp.clip(mi, 0, scene.meshlet_tris.shape[0] - 1)

    out = dict(
        rows_hbm=scene.meshlet_setup_row,  # [M,16,128] bf16, by reference
        mi=mi,
        tri_count=scene.meshlet_triangle_count[mi],  # [K]
        xform=scene.draw_xform_row[draw_id],  # [K,8]
        draw_id=draw_id,
        mat_index=scene.draw_material_index[draw_id],
        post_pass=scene.draw_post_pass[draw_id],
        # shape (1,): 0-d arrays break the frame's cross-pass tree concat
        count=jnp.reshape(cluster_count, (1,)),
    )
    # opacity rows only when the scene has alpha-tested content; the kernel
    # has a static no-alpha variant and only post clusters pay the DMA
    if getattr(scene, "has_alpha_masks", False):
        out["alpha_hbm"] = scene.meshlet_alpha
    return out


def order_clusters_by_x(scene, params, cluster_draw, cluster_mi, cluster_count):
    """Reorder surviving clusters by projected screen-x center.

    The tile raster kernel narrows each record chunk's evaluation to the
    x-BANDS its records span (raster_tile._raster_kernel); in draw-major
    cluster order a tile's records come from meshlets scattered across the
    whole tile width, so chunks span all bands and the narrowing wins
    nothing.  Sorting clusters by screen x makes a chunk's records
    spatially tight (~meshlet width), which is where the banded kernel's
    4-6x coverage-eval cut actually comes from.

    Sound because raster resolution is ORDER-INDEPENDENT: the winner is
    max depth with ties to the smallest fragment id — a total order on
    (z, -id) reduced associatively across chunks — so the depth/vis image
    is bit-identical under any record permutation; only the fragment id
    VALUES (compacted record indices) change, and every consumer resolves
    them through the same reordered arrays.

    Returns (cluster_draw, cluster_mi) reordered; dead tail slots keep
    dead values (sorted after every live cluster)."""
    from . import cullmath as _cm

    K = cluster_draw.shape[0]
    slot_bits = max(K - 1, 1).bit_length()
    xq_bits = 31 - slot_bits  # key = xq << slot_bits | slot fits u32
    k = jnp.arange(K, dtype=jnp.int32)
    live = k < cluster_count

    xf = scene.draw_xform_row[cluster_draw]  # [K,8]
    mrow = scene.meshlet_cull_row[
        jnp.clip(cluster_mi, 0, scene.meshlet_cull_row.shape[0] - 1)
    ]
    world = _cm.rotate_quat(mrow[:, 0:3], xf[:, 4:8]) * xf[:, 3:4] + xf[:, 0:3]
    view = params.view
    camx = world @ view[0, :3] + view[0, 3]
    viewz = world @ view[2, :3] + view[2, 3]
    # only the ORDER matters: camx/viewz is monotone in screen x for
    # in-front clusters; behind-near ones get a clamped ratio (their
    # records carry conservative AABBs anyway)
    ratio = camx / jnp.maximum(viewz, 1e-3)
    half = jnp.float32(1 << (xq_bits - 1))
    xq = jnp.clip(ratio * 256.0 + half, 0.0, 2.0 * half - 1.0).astype(jnp.uint32)
    key = jnp.where(
        live,
        (xq << slot_bits) | k.astype(jnp.uint32),
        (jnp.uint32(1) << 31) | k.astype(jnp.uint32),  # dead: after all live
    )
    (key_sorted,) = jax.lax.sort((key,), num_keys=1)
    idx = (key_sorted & jnp.uint32((1 << slot_bits) - 1)).astype(jnp.int32)
    return cluster_draw[idx], cluster_mi[idx]


def transform_meta_direct(scene, cluster_draw, cluster_mi, cluster_count):
    """transform_meta for the cluster-direct cull path (ops/cull.py
    cluster_cull_direct): same output contract, fed by flat (draw, meshlet)
    cluster lists instead of (command, lane) pairs."""
    mi = jnp.clip(cluster_mi, 0, scene.meshlet_tris.shape[0] - 1)
    out = dict(
        rows_hbm=scene.meshlet_setup_row,
        mi=mi,
        tri_count=scene.meshlet_triangle_count[mi],
        xform=scene.draw_xform_row[cluster_draw],
        draw_id=cluster_draw,
        mat_index=scene.draw_material_index[cluster_draw],
        post_pass=scene.draw_post_pass[cluster_draw],
        count=jnp.reshape(cluster_count, (1,)),
    )
    if getattr(scene, "has_alpha_masks", False):
        out["alpha_hbm"] = scene.meshlet_alpha
    return out


def compact_setup(tc, width, height, znear, capacity: int):
    """Validity-test all [K,96] triangles, stream-compact the survivors, and
    compute edge/depth coefficients only for them.

    This keeps every downstream stage (pair sort, raster, shading) at
    *active-triangle* scale instead of capacity scale — the single biggest
    frame-cost lever on TPU, where dense math over dead slots is pure waste.

    Returns the setup dict of [capacity] arrays (same keys as
    setup_triangles) plus tri_k/tri_t (cluster + local triangle of each slot)
    and `count`.  Fragment ids are compacted slot indices.
    """
    tri = tc["tri"]  # [K,96,3]
    K = tri.shape[0]
    V = tc["hx"].shape[1]

    # Corner fetch as a batched one-hot matmul: triangles are matrix rows,
    # the cluster's 64 vertices are the contraction axis.  On this TPU a
    # [K,96,64]@[K,64,F] dot_general runs ~3 orders of magnitude faster than
    # per-element gathers, because the MXU does the permutation as dense
    # FLOPs.  All channels ride ONE dot per corner; exactness comes from
    # bf16-split encoding:
    #   * positions (sx, sy, viewz): 3 bf16 components each (8 mantissa bits
    #     x3 covers all 24) — each product is x_part * 1.0 with a one-hot row
    #     selecting exactly one vertex, so every term and the f32 sum of the
    #     disjoint mantissa segments is exact;
    #   * normals/uvs: 2 components (16 mantissa bits — G-buffer encodings
    #     keep 10, so this is lossless end to end);
    #   * vertex ids: 3 byte-sized integer pieces (exact in bf16).
    nrm = tc.get("normal", jnp.zeros(tc["hx"].shape + (3,), jnp.float32))
    uv = tc.get("uv", jnp.zeros(tc["hx"].shape + (2,), jnp.float32))

    pos = jnp.stack([tc["hx"], tc["hy"], tc["viewz"], tc["zw"]], axis=-1)  # [K,64,4]
    p1 = pos.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = pos - p1
    p2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    p3 = r1 - p2

    att = jnp.concatenate([nrm, uv], axis=-1)  # [K,64,5]
    q1 = att.astype(jnp.bfloat16).astype(jnp.float32)
    q2 = att - q1

    vid32 = tc["vid"].astype(jnp.int32)
    v0 = (vid32 & 255).astype(jnp.float32)
    v1 = ((vid32 >> 8) & 255).astype(jnp.float32)
    v2 = (vid32 >> 16).astype(jnp.float32)

    channels = jnp.concatenate(
        [p1, p2, p3, q1, q2, jnp.stack([v0, v1, v2], axis=-1)], axis=-1
    ).astype(jnp.bfloat16)  # [K,64,25]

    iota = jnp.arange(V, dtype=jnp.int32)
    dn = (((2,), (1,)), ((0,), (0,)))
    corners = []
    for c in range(3):
        oh = (tri[:, :, c, None] == iota[None, None, :]).astype(jnp.bfloat16)
        co = jax.lax.dot_general(oh, channels, dn, preferred_element_type=jnp.float32)
        corners.append(
            dict(
                x=co[..., 0] + co[..., 4] + co[..., 8],
                y=co[..., 1] + co[..., 5] + co[..., 9],
                vz=co[..., 2] + co[..., 6] + co[..., 10],
                z=co[..., 3] + co[..., 7] + co[..., 11],
                n=co[..., 12:15] + co[..., 17:20],
                uv=co[..., 15:17] + co[..., 20:22],
                vid=co[..., 22] + co[..., 23] * 256.0 + co[..., 24] * 65536.0,
            )
        )

    ahx, ahy, aw, azw = (corners[0][k] for k in ("x", "y", "vz", "z"))
    bhx, bhy, bw, bzw = (corners[1][k] for k in ("x", "y", "vz", "z"))
    chx, chy, cw, czw = (corners[2][k] for k in ("x", "y", "vz", "z"))

    # Olano-Greer homogeneous triangle setup: edge functions are the rows of
    # adj([[hx0,hy0,w0],[hx1,hy1,w1],[hx2,hy2,w2]]) evaluated at (px,py,1).
    # Works for vertices on/behind the near plane with NO clipping stage —
    # the per-pixel 0 < z <= 1 test in the raster kernels clips exactly.
    # At w==1 this reduces bit-for-bit to the screen-space edge equations.
    #
    # Winding: content is glTF/OBJ counter-clockwise front-facing (reference
    # VK_FRONT_FACE_COUNTER_CLOCKWISE + negative-viewport y-flip nets ZERO
    # flips, shaders.cpp:687, niagara.cpp:1641); our image-space y flip makes
    # CCW-world triangles negative-determinant, so edges and det are NEGATED
    # to keep the e >= 0 inside / det > 0 front convention.
    def cross_rows(px, py, pw, qx, qy, qw):
        return (pw * qy - py * qw, px * qw - pw * qx, py * qx - px * qy)

    eAB = cross_rows(ahx, ahy, aw, bhx, bhy, bw)  # -adj row 2 (weight of C)
    eBC = cross_rows(bhx, bhy, bw, chx, chy, cw)  # -adj row 0 (weight of A)
    eCA = cross_rows(chx, chy, cw, ahx, ahy, aw)  # -adj row 1 (weight of B)
    det = ahx * eBC[0] + ahy * eBC[1] + aw * eBC[2]
    front = det > 0.0

    # affine depth plane: z(p) = sum_j (zw_j * w_j) * adj_j(p) / det —
    # evaluates to zw_j exactly at corner j and equals znear*(sum u)/det for
    # the production zw = znear/viewz (perspective-exact reverse-Z depth)
    inv_det = jnp.where(jnp.abs(det) < 1e-30, 0.0, 1.0 / det)
    ka, kb, kc = azw * aw, bzw * bw, czw * cw
    za = (ka * eBC[0] + kb * eCA[0] + kc * eAB[0]) * inv_det
    zb = (ka * eBC[1] + kb * eCA[1] + kc * eAB[1]) * inv_det
    zc = (ka * eBC[2] + kb * eCA[2] + kc * eAB[2]) * inv_det

    # post passes render double-sided with a depth bias (reference
    # niagara.cpp:1647-1648: cull mode NONE + depth bias 16 — foliage and
    # decals are back-face visible).  Back-facing post triangles keep their
    # exact depth plane (det sign cancels in za/zb/zc) but need their edge
    # signs flipped so the e >= 0 coverage convention holds; the bias is a
    # relative 16-ulp-class push toward the camera in reverse-Z.
    post = tc.get("post_pass")
    if post is not None:
        is_post = jnp.broadcast_to((post > 0)[:, None], det.shape)
        flip = is_post & (det < 0.0)
        sgn = jnp.where(flip, -1.0, 1.0)
        eAB = tuple(e * sgn for e in eAB)
        eBC = tuple(e * sgn for e in eBC)
        eCA = tuple(e * sgn for e in eCA)
        zbias = jnp.where(is_post, 1.0 + 2.0**-19, 1.0)
        za, zb, zc = za * zbias, zb * zbias, zc * zbias
        front = front | flip

    # sliver triangles can overflow the depth plane to Inf (|inv_det| up to
    # 1e30 times ~1e12 homogeneous edge terms); non-finite records poison
    # one-hot MXU gathers downstream (Inf * 0 = NaN), so such triangles are
    # invalid and their plane coefficients zeroed (bit-identical rule to the
    # fused setup kernel, setup_fused.py)
    zmag = jnp.maximum(jnp.maximum(jnp.abs(za), jnp.abs(zb)), jnp.abs(zc))
    zfin = zmag < 1e30
    za = jnp.where(zfin, za, 0.0)
    zb = jnp.where(zfin, zb, 0.0)
    zc = jnp.where(zfin, zc, 0.0)
    front = front & zfin

    # screen-space corners (guarded division) for the AABB and the fallback
    # shading record; triangles with any corner at w<=0 get a conservative
    # full-screen AABB (their projected corners are meaningless, but edge +
    # depth tests stay exact)
    def sdiv(h, w):
        return h / jnp.where(w > 1e-9, w, 1e-9)

    ax, ay = sdiv(ahx, aw), sdiv(ahy, aw)
    bx, by = sdiv(bhx, bw), sdiv(bhy, bw)
    cx, cy = sdiv(chx, cw), sdiv(chy, cw)

    behind_any = (aw <= 1e-9) | (bw <= 1e-9) | (cw <= 1e-9)
    all_behind = (aw < znear) & (bw < znear) & (cw < znear)

    x0f = jnp.where(behind_any, 0.0, jnp.floor(jnp.minimum(jnp.minimum(ax, bx), cx)))
    y0f = jnp.where(behind_any, 0.0, jnp.floor(jnp.minimum(jnp.minimum(ay, by), cy)))
    x1f = jnp.where(behind_any, float(width), jnp.ceil(jnp.maximum(jnp.maximum(ax, bx), cx)))
    y1f = jnp.where(behind_any, float(height), jnp.ceil(jnp.maximum(jnp.maximum(ay, by), cy)))
    on_screen = (x1f > 0) & (y1f > 0) & (x0f < width) & (y0f < height)

    valid = tc["tri_valid"] & front & ~all_behind & on_screen

    e0, e1, e2 = eAB, eBC, eCA

    x0d = jnp.clip(x0f, 0, width - 1)
    y0d = jnp.clip(y0f, 0, height - 1)
    x1d = jnp.clip(x1f, 0, width)
    y1d = jnp.clip(y1f, 0, height)
    valid = valid & (x1d > x0d) & (y1d > y0d)

    rec = jnp.stack(
        [e0[0], e0[1], e0[2], e1[0], e1[1], e1[2], e2[0], e2[1], e2[2], za, zb, zc,
         x0d, y0d, x1d, y1d],
        axis=-1,
    ).reshape(K * MESH_MAXTRI, 16)

    # packed per-triangle shading record: per-corner (x, y, viewz, world
    # normal, uv) + vertex ids + material/post/draw ids.  Shading then needs
    # exactly one row gather per pixel instead of ~15 element gathers
    # (see ops/shade.py).  Integer ids ride as f32 (exact below 2^24).
    def b96(a):
        return jnp.broadcast_to(a[:, None], (K, MESH_MAXTRI)).astype(jnp.float32)

    shade_cols = []
    screen_xy = [(ax, ay), (bx, by), (cx, cy)]
    for c in range(3):
        cc = corners[c]
        sx_c, sy_c = screen_xy[c]
        shade_cols += [sx_c, sy_c, cc["vz"],
                       cc["n"][..., 0], cc["n"][..., 1], cc["n"][..., 2],
                       cc["uv"][..., 0], cc["uv"][..., 1]]
    shade_cols += [corners[c]["vid"] for c in range(3)]
    shade_cols += [b96(tc["draw_id"]), b96(tc.get("mat_index", jnp.zeros(K, jnp.int32))),
                   b96(tc.get("post_pass", jnp.zeros(K, jnp.int32)))]
    # pad to 32 columns: 48-wide combined rows gather ~5x faster than 46-wide
    # (row gathers off the aligned-size fast path are element-rate slow)
    shade_cols += [jnp.zeros((K, MESH_MAXTRI), jnp.float32)] * 2
    rec_shade = jnp.stack(shade_cols, axis=-1).reshape(K * MESH_MAXTRI, 32)

    # compact the flat (cluster, tri) index of survivors
    mask = valid.reshape(-1)
    pos = jnp.cumsum(mask) - mask
    raw_count = jnp.sum(mask)
    count = jnp.minimum(raw_count, capacity)
    slot = jnp.where(mask & (pos < capacity), pos, capacity)
    tidx = jnp.zeros(capacity, dtype=jnp.int32).at[slot].set(
        jnp.arange(K * MESH_MAXTRI, dtype=jnp.int32), mode="drop"
    )

    # one wide row gather for both records (gather setup cost is per-row,
    # so 16+32 columns in a single pass beats two separate gathers)
    if "alpha" in tc:
        # opacity-mask channels ride cols 48-55 (cooker/opacity.py layout),
        # enabling raster-time alpha test on this path too (the sun map
        # renders alpha-tested casters through here)
        rec_alpha = jnp.stack(
            [tc["alpha"][:, i, :MESH_MAXTRI] for i in range(8)], axis=-1
        ).reshape(K * MESH_MAXTRI, 8)
        both = jnp.concatenate([rec, rec_shade, rec_alpha], axis=-1)[tidx]  # [cap, 56]
    else:
        both = jnp.concatenate([rec, rec_shade], axis=-1)[tidx]  # [cap, 48]
        both = jnp.concatenate([both, jnp.zeros((both.shape[0], 8), both.dtype)], axis=-1)
    out = both[:, :16]
    shade_rec = both[:, 16:48]
    # col 13 (the bbox y0 slot — the tile kernels read x0/x1 only) carries
    # the record's own compacted index, matching the fused setup kernel:
    # fragment ids become col13 + frag_offset inside the kernels, removing
    # the [P]-scale id-column rewrite from the pair-stream build.  y0 is
    # extracted above (out is sliced pre-overwrite lazily, so read it now).
    y0_col = both[:, 13].astype(jnp.int32)
    both = both.at[:, 13].set(jnp.arange(capacity, dtype=both.dtype))
    live = jnp.arange(capacity, dtype=jnp.int32) < count

    return dict(
        valid=live,
        rec16=out,
        rec48=both,
        e=[(out[:, 0], out[:, 1], out[:, 2]), (out[:, 3], out[:, 4], out[:, 5]), (out[:, 6], out[:, 7], out[:, 8])],
        za=out[:, 9],
        zb=out[:, 10],
        zc=out[:, 11],
        x0=out[:, 12].astype(jnp.int32),
        y0=y0_col,
        x1=out[:, 14].astype(jnp.int32),
        y1=out[:, 15].astype(jnp.int32),
        shade_rec=shade_rec,
        tri_k=tidx // MESH_MAXTRI,
        tri_t=tidx % MESH_MAXTRI,
        count=count,
        dropped=jnp.maximum(raw_count - capacity, 0).astype(jnp.int32),
    )


def _compact(mask, payload_arrays, capacity):
    """Stream-compact indices where mask is set into [capacity] slots.

    Returns (slots dict of arrays, count).  Deterministic (prefix-sum order).
    """
    pos = jnp.cumsum(mask) - mask
    count = jnp.sum(mask)
    slot = jnp.where(mask & (pos < capacity), pos, capacity)
    out = {}
    for name, arr in payload_arrays.items():
        out[name] = jnp.zeros((capacity,) + arr.shape[1:], dtype=arr.dtype).at[slot].set(arr, mode="drop")
    return out, jnp.minimum(count, capacity)


def _emit_windows(setup, *, small_tiles: int, mid_tiles: int, mid_capacity: int, window_capacity: int,
                  giant_x: int = 0, giant_y: int = 0, giant_capacity: int = 16):
    """Emit 8x8-pixel raster-window records (tri_ref, wx, wy) for every
    surviving triangle, bounded-memory:

    * triangles spanning <= small_tiles^2 windows emit densely from [T, s^2];
    * triangles spanning <= mid_tiles^2 are first compacted to [mid_capacity]
      and then emit from [mid_capacity, m^2] (they are rare, so the dense
      block stays small);
    * larger triangles are dropped and counted (`huge_dropped`), mirroring
      the reference's capacity-overflow drops.

    Returns (win_tri, win_x, win_y [window_capacity], window_count,
    huge_dropped).  win_tri indexes the flattened setup arrays; frag_id is
    carried separately by the caller.
    """
    T = setup["valid"].shape[0]
    x0, y0, x1, y1 = setup["x0"], setup["y0"], setup["x1"], setup["y1"]
    wx0 = x0 // WIN
    wy0 = y0 // WIN
    wspan = (x1 - 1) // WIN - wx0 + 1
    hspan = (y1 - 1) // WIN - wy0 + 1

    valid = setup["valid"]
    is_small = valid & (wspan <= small_tiles) & (hspan <= small_tiles)
    is_mid = valid & ~is_small & (wspan <= mid_tiles) & (hspan <= mid_tiles)
    huge_dropped = jnp.sum(valid & ~is_small & ~is_mid)

    def emit(tri_idx, sel, wx0s, wy0s, wss, hss, tiles, capacity, base, tiles_y=None):
        """Dense [N, tiles*tiles_y] window emission with prefix-sum placement."""
        tiles_y = tiles if tiles_y is None else tiles_y
        n_win = jnp.where(sel, wss * hss, 0)
        start = jnp.cumsum(n_win) - n_win + base
        fits = start + n_win <= capacity
        n_win = jnp.where(fits, n_win, 0)
        total = jnp.sum(n_win)

        s = jnp.arange(tiles * tiles_y, dtype=jnp.int32)[None, :]
        sx = s % tiles
        sy = s // tiles
        live = (sx < wss[:, None]) & (sy < hss[:, None]) & (n_win > 0)[:, None]
        # window's slot: start + sy*wspan + sx (row-major within the tri)
        slot = jnp.where(live, start[:, None] + sy * wss[:, None] + sx, capacity)
        wx = wx0s[:, None] + sx
        wy = wy0s[:, None] + sy
        return slot.reshape(-1), jnp.broadcast_to(tri_idx[:, None], slot.shape).reshape(-1), \
            wx.reshape(-1), wy.reshape(-1), total

    win_tri = jnp.zeros(window_capacity, dtype=jnp.int32)
    win_x = jnp.zeros(window_capacity, dtype=jnp.int32)
    win_y = jnp.zeros(window_capacity, dtype=jnp.int32)

    tri_idx = jnp.arange(T, dtype=jnp.int32)
    slot_s, tri_s, wx_s, wy_s, total_s = emit(tri_idx, is_small, wx0, wy0, wspan, hspan, small_tiles, window_capacity, 0)
    win_tri = win_tri.at[slot_s].set(tri_s, mode="drop")
    win_x = win_x.at[slot_s].set(wx_s, mode="drop")
    win_y = win_y.at[slot_s].set(wy_s, mode="drop")

    # mid path: compact the (rare) larger triangles first
    mid, n_mid = _compact(
        is_mid,
        dict(tri=tri_idx, wx0=wx0, wy0=wy0, ws=wspan, hs=hspan),
        mid_capacity,
    )
    mid_live = jnp.arange(mid_capacity, dtype=jnp.int32) < n_mid
    slot_m, tri_m, wx_m, wy_m, total_m = emit(
        mid["tri"], mid_live, mid["wx0"], mid["wy0"], mid["ws"], mid["hs"], mid_tiles, window_capacity, total_s
    )
    win_tri = win_tri.at[slot_m].set(tri_m, mode="drop")
    win_x = win_x.at[slot_m].set(wx_m, mode="drop")
    win_y = win_y.at[slot_m].set(wy_m, mode="drop")
    total = total_s + total_m

    if giant_x > 0 and giant_y > 0:
        # giant path (near-plane straddlers with conservative full-screen
        # AABBs): emit the full window grid for a tiny compacted set
        is_giant = valid & ~is_small & ~is_mid
        huge_dropped = jnp.maximum(jnp.sum(is_giant) - giant_capacity, 0)
        gi, n_g = _compact(
            is_giant, dict(tri=tri_idx, wx0=wx0, wy0=wy0, ws=wspan, hs=hspan), giant_capacity
        )
        g_live = jnp.arange(giant_capacity, dtype=jnp.int32) < n_g
        slot_g, tri_g, wx_g, wy_g, total_g = emit(
            gi["tri"], g_live, gi["wx0"], gi["wy0"],
            jnp.minimum(gi["ws"], giant_x), jnp.minimum(gi["hs"], giant_y),
            giant_x, window_capacity, total, tiles_y=giant_y,
        )
        win_tri = win_tri.at[slot_g].set(tri_g, mode="drop")
        win_x = win_x.at[slot_g].set(wx_g, mode="drop")
        win_y = win_y.at[slot_g].set(wy_g, mode="drop")
        total = total + total_g

    window_count = jnp.minimum(total, window_capacity)
    return win_tri, win_x, win_y, window_count, huge_dropped


def rasterize(
    setup,
    width,
    height,
    *,
    window_capacity: int = 1 << 20,
    chunk: int = 1 << 16,
    mid_capacity: int = 1 << 14,
    fb: Framebuffer | None = None,
    frag_offset: int = 0,
    # kept for call-site compatibility; small_capacity bounds total windows
    small_capacity: int | None = None,
    big_capacity: int | None = None,
):
    """Rasterize set-up triangles into (depth, visibility) buffers.

    Window records are merged into the framebuffer by a chunked lax.scan:
    each step gathers `chunk` windows' triangle coefficients, evaluates the
    8x8 pixel block densely on the VPU, and scatter-maxes depth.  A second
    scan resolves the visibility buffer by scatter-minning the fragment id of
    exact depth winners.  Peak temp memory is O(chunk * 64), independent of
    triangle count.

    Pass `fb` to merge into an existing framebuffer (the late render pass
    loads instead of clearing, reference niagara.cpp:1645 LOAD_OP_LOAD);
    `frag_offset` shifts fragment ids so multiple passes share one
    concatenated attribute table at shade time.
    """
    if small_capacity is not None:
        window_capacity = small_capacity
    # round capacity to a chunk multiple (small test capacities shrink chunk)
    chunk = min(chunk, window_capacity)
    window_capacity = (window_capacity + chunk - 1) // chunk * chunk

    T = setup["valid"].shape[0]
    win_tri, win_x, win_y, n_win, huge_dropped = _emit_windows(
        setup,
        small_tiles=SMALL_TILES,
        mid_tiles=MID_TILES,
        mid_capacity=mid_capacity,
        window_capacity=window_capacity,
        giant_x=-(-width // WIN),
        giant_y=-(-height // WIN),
    )

    if fb is None:
        depth = jnp.zeros(height * width, dtype=jnp.float32)
        vis = jnp.full(height * width, INVALID_FRAG, dtype=jnp.int32)
    else:
        depth = fb.depth.reshape(-1)
        vis = fb.vis.reshape(-1)

    npix = width * height
    n_chunks = window_capacity // chunk

    a0, b0, c0 = setup["e"][0]
    a1, b1, c1 = setup["e"][1]
    a2, b2, c2 = setup["e"][2]
    za, zb, zc = setup["za"], setup["zb"], setup["zc"]
    x1c, y1c = setup["x1"], setup["y1"]

    dx = jnp.arange(WIN, dtype=jnp.int32)[None, None, :]  # [1,1,8]
    dy = jnp.arange(WIN, dtype=jnp.int32)[None, :, None]  # [1,8,1]

    def eval_chunk(ci):
        off = ci * chunk
        tri = jax.lax.dynamic_slice(win_tri, (off,), (chunk,))
        wx = jax.lax.dynamic_slice(win_x, (off,), (chunk,))
        wy = jax.lax.dynamic_slice(win_y, (off,), (chunk,))
        live = (jnp.arange(chunk, dtype=jnp.int32) + off) < n_win

        px = wx[:, None, None] * WIN + dx  # [chunk,1,8] -> broadcast [chunk,8,8]
        py = wy[:, None, None] * WIN + dy
        fx = px.astype(jnp.float32) + 0.5
        fy = py.astype(jnp.float32) + 0.5

        def ev(a, b, c):
            return a[tri][:, None, None] * fx + b[tri][:, None, None] * fy + c[tri][:, None, None]

        def cov(a, b, c):
            # top-left fill rule (Vulkan basic rasterization rules): a pixel
            # center exactly on an edge belongs to the triangle whose
            # interior is right of (a > 0) or, for horizontal edges, below
            # (a == 0, b > 0) the edge — each shared-edge pixel is covered
            # exactly once.  Matches the fixed-point scalar oracle
            # (tests/raster_oracle.py) wherever f32 resolves e == 0 exactly.
            e = ev(a, b, c)
            tl = (a[tri] > 0) | ((a[tri] == 0) & (b[tri] > 0))
            return (e > 0) | (tl[:, None, None] & (e == 0))

        cover = cov(a0, b0, c0) & cov(a1, b1, c1) & cov(a2, b2, c2)
        z = ev(za, zb, zc)
        cover &= (px < jnp.minimum(x1c[tri], width)[:, None, None]) & (
            py < jnp.minimum(y1c[tri], height)[:, None, None]
        )
        cover &= live[:, None, None] & (z > 0.0) & (z <= 1.0)
        flat = py * width + px
        return tri, flat, z, cover

    def depth_step(d, ci):
        tri, flat, z, cover = eval_chunk(ci)
        idx = jnp.where(cover, flat, npix).reshape(-1)
        return d.at[idx].max(z.reshape(-1), mode="drop"), None

    depth, _ = jax.lax.scan(depth_step, depth, jnp.arange(n_chunks, dtype=jnp.int32))

    def vis_step(v, ci):
        tri, flat, z, cover = eval_chunk(ci)
        safe = jnp.clip(flat, 0, npix - 1)
        winner = cover & (z == depth[safe])
        idx = jnp.where(winner, flat, npix).reshape(-1)
        frag = jnp.broadcast_to((tri + frag_offset)[:, None, None], z.shape).reshape(-1)
        return v.at[idx].min(frag, mode="drop"), None

    vis, _ = jax.lax.scan(vis_step, vis, jnp.arange(n_chunks, dtype=jnp.int32))

    return Framebuffer(depth=depth.reshape(height, width), vis=vis.reshape(height, width))


def rasterize_onto(fb: Framebuffer, setup, width, height, *, frag_offset: int, small_capacity: int, big_capacity: int = 256) -> Framebuffer:
    """Merge a second raster pass into an existing framebuffer."""
    return rasterize(
        setup, width, height,
        small_capacity=small_capacity, big_capacity=big_capacity,
        fb=fb, frag_offset=frag_offset,
    )


def rasterize_clusters(
    scene,
    cluster_cmd,
    cluster_lane,
    cluster_count,
    cmds,
    view,
    p00,
    p11,
    znear,
    width: int,
    height: int,
    *,
    small_capacity: int = 1 << 20,
    big_capacity: int = 256,
):
    """Full raster pipeline: transform -> setup -> rasterize.

    Returns (Framebuffer, cluster transform dict) — the latter is reused by
    the deferred shading pass to fetch attributes for visible fragments.
    """
    tc = transform_clusters(scene, cluster_cmd, cluster_lane, cluster_count, cmds, view, p00, p11, znear, width, height)
    st = compact_setup(tc, width, height, znear, small_capacity)
    fb = rasterize(st, width, height, small_capacity=small_capacity, big_capacity=big_capacity)
    return fb, tc
