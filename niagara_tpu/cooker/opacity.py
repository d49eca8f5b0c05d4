"""Opacity micromap bake for alpha-tested geometry.

Role of the reference's buildSceneOmm (scene.cpp:880-1068): for every
triangle of every alpha-tested mesh, measure the albedo texture's alpha and
bake a per-triangle opacity map consumed at render time without touching the
texture.

TPU redesign: instead of the bary-subdivided micromap + HW OMM traversal,
each meshlet triangle gets an **8x8 bitmask over its uv-space AABB** plus
the AABB itself.  At raster/trace time the hit point's interpolated uv maps
to a cell with two multiplies and the bit gates coverage — pure VPU
arithmetic on data already streaming through the record pipeline, no
per-pixel texture gathers.  The same table drives:

  * raster-time alpha test (reference mesh.frag.glsl:88-89 `discard`);
  * alpha-tested any-hit shadow rays (reference shadow.comp.glsl:78-123 +
    the OMM fast path).

The mask row layout is 8 f32 lanes (all values exact in f32):
  [0:4] mask 64 bits as four 16-bit halves (bit b = cell (b>>3, b&7) opaque)
  [4]   u0   [5] v0    (uv AABB origin)
  [6]   8/du [7] 8/dv  (cell scale; 0 => no alpha test, always opaque)
"""

from __future__ import annotations

import numpy as np


def _sample_alpha(mip: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Point-sample the alpha channel with repeat wrap (the bake-time stand-in
    for the reference's per-fragment sampler)."""
    h, w = mip.shape[:2]
    x = np.floor((u - np.floor(u)) * w).astype(np.int64) % w
    y = np.floor((v - np.floor(v)) * h).astype(np.int64) % h
    return mip[y, x, 3].astype(np.float32) / 255.0


def bake_mesh_masks(uv: np.ndarray, tris_uv_idx: np.ndarray, alpha_mip: np.ndarray,
                    threshold: float = 0.5) -> np.ndarray:
    """Bake mask rows for a [T,3] triangle list with per-corner uv indices.

    Returns [T, 8] f32 rows in the module-level layout.  A cell is opaque
    if ANY of its sub-samples passes the alpha threshold; the sub-sample
    density ADAPTS to the triangle's uv extent (>= 2 samples per texel on
    the longest AABB axis, bucketed) so thin features — 1-texel stems,
    wires — are never missed even on triangles spanning the whole texture.
    A fixed 16x16 grid measured ~1.7% false DISCARDS (real pixels dropped)
    on a foliage card; adaptive density drives that to zero
    (tests/test_alpha_fidelity.py) at offline-bake cost only."""
    T = len(tris_uv_idx)
    out = np.zeros((T, 8), np.float32)
    if T == 0:
        return out

    tuv = uv[tris_uv_idx]  # [T,3,2]
    u0 = tuv[..., 0].min(axis=1)
    v0 = tuv[..., 1].min(axis=1)
    u1 = tuv[..., 0].max(axis=1)
    v1 = tuv[..., 1].max(axis=1)
    du = np.maximum(u1 - u0, 1e-12)
    dv = np.maximum(v1 - v0, 1e-12)

    h, w = alpha_mip.shape[:2]
    need = 2.0 * np.maximum(du * w, dv * h)  # samples/axis for 2x texel rate
    cells = np.zeros((T, 8, 8), bool)
    buckets = (16, 64, 256, 1024)
    for s in buckets:
        sel = np.nonzero(np.isfinite(need) & ((need <= s) | (s == buckets[-1])))[0]
        need[sel] = np.inf  # claimed
        # chunk to bound the [n, s, s] sample grid at ~32M samples
        step = max(1, (32 << 20) // (s * s))
        sub = (np.arange(s) + 0.5) / s  # cell c covers sub[c*s//8:(c+1)*s//8]
        for o in range(0, len(sel), step):
            t = sel[o : o + step]
            gu = u0[t, None] + du[t, None] * sub[None, :]  # [n,s]
            gv = v0[t, None] + dv[t, None] * sub[None, :]
            uu = np.broadcast_to(gu[:, None, :], (len(t), s, s))
            vv = np.broadcast_to(gv[:, :, None], (len(t), s, s))
            a = _sample_alpha(alpha_mip, uu.reshape(-1), vv.reshape(-1)).reshape(len(t), s, s)
            opq = a >= threshold
            cells[t] = opq.reshape(len(t), 8, s // 8, 8, s // 8).any(axis=(2, 4))

    bits = cells.reshape(T, 64).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    mask = bits.sum(axis=1, dtype=np.uint64)
    for h in range(4):
        out[:, h] = ((mask >> np.uint64(16 * h)) & np.uint64(0xFFFF)).astype(np.float32)
    out[:, 4] = u0
    out[:, 5] = v0
    out[:, 6] = 8.0 / du
    out[:, 7] = 8.0 / dv
    return out


def bake_opacity(geometry, draws, materials: dict | None, texture_mips: list | None,
                 threshold: float = 0.5) -> np.ndarray | None:
    """Scene-level bake: mask rows for every meshlet triangle of every mesh
    referenced by an alpha-tested draw (postPass == 1).

    `texture_mips`: list of per-texture mip lists ([h,w,4] u8), indexed by
    the RAW material texture ids (materials["textures"], -1 = none — the +1
    shift to the device texture table happens at upload).  Returns
    [M, 96, 8] f32 (zero rows = no alpha test) or None when nothing is
    alpha-tested."""
    from ..scene import unpack_meshlet_refs

    if materials is None or texture_mips is None:
        return None
    post = np.asarray(draws.post_pass)
    alpha_draws = np.nonzero(post == 1)[0]
    if len(alpha_draws) == 0:
        return None

    mat_tex = np.asarray(materials["textures"])  # [NM,4], albedo at col 0
    mesh_mat = {}
    for d in alpha_draws:
        mesh_mat[int(draws.mesh_index[d])] = int(draws.material_index[d])

    vertex_ids, tris = unpack_meshlet_refs(geometry)
    M = len(tris)
    out = np.zeros((M, 96, 8), np.float32)

    m = geometry.meshes
    uv = geometry.vuv.astype(np.float32)
    for mesh, mat in mesh_mat.items():
        tex_id = int(mat_tex[mat, 0])
        if tex_id < 0 or tex_id >= len(texture_mips):
            continue
        # bake from mip 1 when available (reference uses OMMMIP default 1,
        # niagara.cpp:872: half-res alpha is stabler and 4x cheaper)
        mips = texture_mips[tex_id]
        mip = mips[min(1, len(mips) - 1)]
        for lod in range(int(m.lod_count[mesh])):
            mo = int(m.lod_meshlet_offset[mesh, lod])
            mc = int(m.lod_meshlet_count[mesh, lod])
            for ml in range(mo, mo + mc):
                tcnt = int(geometry.meshlets.triangle_count[ml])
                corner_uv_idx = vertex_ids[ml][tris[ml, :tcnt]]  # [t,3] global verts
                out[ml, :tcnt] = bake_mesh_masks(uv, corner_uv_idx, mip, threshold)
    return out
