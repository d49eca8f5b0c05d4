"""Scene data model.

Two representations:

* :class:`Geometry` / :class:`Draws` — host-side cooked arrays (numpy, SoA),
  mirroring the reference's packed GPU buffer layouts (scene.h:10-109,
  buffer inventory niagara.cpp:1027-1093).  This is what the C++ cooker
  produces and what the scene cache stores.

* :class:`DeviceScene` — TPU-resident arrays with static, padded shapes:
  meshlet vertex references expanded to [M, MESH_MAXVTX] int32 and triangles
  to [M, MESH_MAXTRI, 3], vertex attributes dequantized to f32/f16.  XLA wants
  fixed shapes and vectorized gathers, so the reference's variable-length
  packed meshletdata stream (scene.cpp:24-88) is unpacked once at upload.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field, fields

import jax
import numpy as np

from .config import MAX_LODS, MESH_MAXTRI, MESH_MAXVTX, TASK_WGSIZE
from .utils import math3d


def _register_scene_dataclass(cls):
    names = [f.name for f in fields(cls)]
    meta = [n for n in names if n in ("meshlet_visibility_count", "has_alpha_masks", "texture_slots", "has_texture_meta")]
    data_fields = [n for n in names if n not in meta]
    return jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta)


@dataclass
class Meshlets:
    """SoA meshlet headers (reference scene.h:10-23).

    center/radius are stored dequantized (float32 of the fp16-quantized value)
    so device culling sees exactly what the reference GLSL sees when it reads
    float16 fields.
    """

    center: np.ndarray  # f32 [M,3]
    radius: np.ndarray  # f32 [M]
    cone_axis: np.ndarray  # i8 [M,3]
    cone_cutoff: np.ndarray  # i8 [M]
    data_offset: np.ndarray  # u32 [M]
    base_vertex: np.ndarray  # u32 [M]
    vertex_count: np.ndarray  # u8 [M]
    triangle_count: np.ndarray  # u8 [M]
    short_refs: np.ndarray  # u8 [M]

    @property
    def count(self) -> int:
        return len(self.radius)


@dataclass
class Meshes:
    """SoA mesh headers + LOD tables (reference scene.h:68-93)."""

    center: np.ndarray  # f32 [N,3]
    radius: np.ndarray  # f32 [N]
    vertex_offset: np.ndarray  # u32 [N]
    vertex_count: np.ndarray  # u32 [N]
    lod_count: np.ndarray  # u32 [N]
    lod_rt: np.ndarray  # u32 [N]
    lod_index_offset: np.ndarray  # u32 [N, MAX_LODS]
    lod_index_count: np.ndarray  # u32 [N, MAX_LODS]
    lod_meshlet_offset: np.ndarray  # u32 [N, MAX_LODS]
    lod_meshlet_count: np.ndarray  # u32 [N, MAX_LODS]
    lod_error: np.ndarray  # f32 [N, MAX_LODS]

    @property
    def count(self) -> int:
        return len(self.radius)


@dataclass
class Geometry:
    """Cooked geometry for a whole scene (reference scene.h:95-109)."""

    # Vertex attributes, quantized exactly like reference Vertex (scene.h:60-66)
    vpos: np.ndarray  # f16 [V,3] quantized positions
    vnorm: np.ndarray  # u32 [V] packed 10-10-10-2 normal + bitangent sign
    vtan: np.ndarray  # u16 [V] packed 8-8 octahedral tangent
    vuv: np.ndarray  # f16 [V,2] quantized uvs

    indices: np.ndarray  # u32 [I] LOD-concatenated index buffer
    meshlet_data: np.ndarray  # u32 [D] packed vertex refs + triangle bytes
    meshlets: Meshlets
    meshes: Meshes

    @property
    def vertex_count(self) -> int:
        return len(self.vpos)


@dataclass
class Draws:
    """SoA draw instances (reference scene.h:39-49)."""

    position: np.ndarray  # f32 [N,3]
    scale: np.ndarray  # f32 [N]
    orientation: np.ndarray  # f32 [N,4] quaternion xyzw
    mesh_index: np.ndarray  # i32 [N]
    meshlet_visibility_offset: np.ndarray  # u32 [N]
    post_pass: np.ndarray  # i32 [N]
    material_index: np.ndarray  # i32 [N]

    @property
    def count(self) -> int:
        return len(self.scale)


def assign_meshlet_visibility_offsets(draws: Draws, meshes: Meshes) -> int:
    """Assign per-draw offsets into the persistent meshlet-visibility bitfield
    and return the total slot count (reference niagara.cpp:1002-1020: each draw
    reserves max-over-LODs meshletCount slots).

    TPU twist: slot ranges are rounded up to 64 so every u32 word of the
    bitfield is owned by exactly one draw, which lets the late cull pass
    rebuild words with two deterministic scatters instead of atomics
    (see ops/cull.py cluster_cull)."""
    per_mesh = np.max(meshes.lod_meshlet_count, axis=1)  # [N_mesh]
    per_draw = (per_mesh[draws.mesh_index] + 63) // 64 * 64
    offsets = np.zeros(draws.count, dtype=np.uint32)
    if draws.count:
        np.cumsum(per_draw[:-1], out=offsets[1:])
    draws.meshlet_visibility_offset = offsets.astype(np.uint32)
    return int(per_draw.sum()) if draws.count else 0


def unpack_meshlet_refs(geometry: Geometry) -> tuple[np.ndarray, np.ndarray]:
    """Expand the packed meshletdata stream into fixed-shape arrays.

    Returns (vertex_ids [M, MESH_MAXVTX] int32 absolute vertex indices,
    triangles [M, MESH_MAXTRI, 3] int32 meshlet-local indices).  Padding
    entries replicate index 0 / degenerate triangles (0,0,0); consumers mask by
    vertex_count / triangle_count.

    Layout being decoded (reference scene.cpp:24-50, meshlet.mesh.glsl:112-116):
    at data_offset: vertexCount refs — packed 2x16-bit if short_refs else 32-bit
    — then triangle index bytes packed 4 per u32.
    """
    ml = geometry.meshlets
    M = ml.count
    data = geometry.meshlet_data
    vertex_ids = np.zeros((M, MESH_MAXVTX), dtype=np.int32)
    tris = np.zeros((M, MESH_MAXTRI, 3), dtype=np.int32)

    data_u16 = data.view(np.uint16)
    data_u8 = data.view(np.uint8)

    for m in range(M):
        off = int(ml.data_offset[m])
        vcnt = int(ml.vertex_count[m])
        tcnt = int(ml.triangle_count[m])
        base = int(ml.base_vertex[m])
        if ml.short_refs[m]:
            refs = data_u16[off * 2 : off * 2 + vcnt].astype(np.int32)
            index_off = off + (vcnt + 1) // 2
        else:
            refs = data[off : off + vcnt].astype(np.int32)
            index_off = off + vcnt
        vertex_ids[m, :vcnt] = refs + base
        tri_bytes = data_u8[index_off * 4 : index_off * 4 + tcnt * 3].astype(np.int32)
        tris[m, :tcnt] = tri_bytes.reshape(tcnt, 3)

    return vertex_ids, tris


@_register_scene_dataclass
@dataclass
class DeviceScene:
    """Static-shape arrays ready to become jnp device buffers.

    Registered as a JAX pytree (meshlet_visibility_count is static metadata)
    so the whole scene can be passed through jit/shard_map boundaries.
    """

    # vertex attributes (dequantized)
    positions: np.ndarray  # f32 [V,3]
    normals: np.ndarray  # f32 [V,3]
    uvs: np.ndarray  # f32 [V,2]
    tangents: np.ndarray  # f32 [V,4] xyz + bitangent sign

    # meshlets (fixed shape)
    meshlet_vertices: np.ndarray  # i32 [M, MESH_MAXVTX]
    meshlet_tris: np.ndarray  # i32 [M, MESH_MAXTRI, 3]
    # packed per-meshlet vertex data: positions + shading attributes copied
    # per meshlet slot at upload.  TPU-first layout: element gathers from
    # global vertex arrays are slow; one contiguous row per meshlet makes the
    # hot raster path a coarse row gather (see ops/raster.py).
    # one [M,64,8] row (position, object normal, uv) so transform_clusters
    # fetches all per-vertex data with a single row gather
    meshlet_vdata: np.ndarray  # f32 [M, MESH_MAXVTX, 8]
    # ONE setup row per meshlet for the fused setup kernel's in-kernel DMA
    # (setup_fused.py fetches live clusters' rows straight from HBM; no
    # [K,...] gathered intermediates exist).  Rows 0-9: bf16-split vertex
    # channels, pair-packed (channel 2p in lanes 0-63 of row p, 2p+1 in
    # lanes 64-127): object position/normal/uv as exact 2-component bf16
    # splits (sources are fp16/snorm10 quantized) + vertex-id bytes.
    # Rows 10-12: triangle corner ids (ids < 64, bf16-exact) in lanes 0-95.
    # Rows 13-15: zero pad — bf16 DMA slices need 16-sublane tiles.
    meshlet_setup_row: np.ndarray  # bf16 [M, 16, 2*MESH_MAXVTX]
    meshlet_center: np.ndarray  # f32 [M,3]
    meshlet_radius: np.ndarray  # f32 [M]
    meshlet_cone_axis: np.ndarray  # f32 [M,3] (snorm8 / 127)
    meshlet_cone_cutoff: np.ndarray  # f32 [M]
    # Pre-blocked cull data: row m holds the packed cull rows (center,
    # radius, cone bytes, cutoff byte) of meshlets m..m+63, f16 (all values
    # f16-exact: bounds are fp16-quantized, cone components are int8).
    # cluster_cull fetches a command's 64 consecutive meshlets as ONE 1KB
    # row gather — measured ~4x cheaper than a [C,64] row gather.  Costs
    # 64x the base table (1 KB/meshlet); scene-static HBM.
    meshlet_cull_blocks: np.ndarray  # f16 [M, 512] channel-major (see _build_cull_blocks)
    # Flat per-meshlet cull row for the cluster-direct path (ops/cull.py
    # cluster_cull_direct): [center xyz, radius, cone xyz, cutoff] — one
    # 32 B row gather per cluster instead of a 1 KB 64-meshlet block
    meshlet_cull_row: np.ndarray  # f32 [M, 8]
    meshlet_vertex_count: np.ndarray  # i32 [M]
    meshlet_triangle_count: np.ndarray  # i32 [M]

    # mesh + LOD tables
    mesh_center: np.ndarray  # f32 [N,3]
    mesh_radius: np.ndarray  # f32 [N]
    mesh_lod_count: np.ndarray  # i32 [N]
    lod_meshlet_offset: np.ndarray  # i32 [N, MAX_LODS]
    lod_meshlet_count: np.ndarray  # i32 [N, MAX_LODS]
    lod_error: np.ndarray  # f32 [N, MAX_LODS]

    # draws
    draw_position: np.ndarray  # f32 [D,3]
    draw_scale: np.ndarray  # f32 [D]
    draw_orientation: np.ndarray  # f32 [D,4]
    draw_mesh_index: np.ndarray  # i32 [D]
    draw_vis_offset: np.ndarray  # i32 [D]
    draw_post_pass: np.ndarray  # i32 [D]
    draw_material_index: np.ndarray  # i32 [D]

    # Baked per-draw tables (TPU-first layout): the reference's shaders
    # gather mesh[draw.meshIndex] per thread (drawcull.comp.glsl:58), which
    # is free on a GPU but costs ~10ns/element through XLA's gather on TPU.
    # Meshes are static, so the per-draw mesh data is expanded once at
    # upload; the cull pass then *streams* these rows with zero gathers.
    # draw_mesh_row: [0:3] bound center, [3] radius, [4] lod_count,
    #                [5:5+MAX_LODS] lod errors
    draw_mesh_row: np.ndarray = None  # f32 [D, 5+MAX_LODS]
    draw_lod_meshlet_count: np.ndarray = None  # i32 [D, MAX_LODS]
    draw_lod_meshlet_offset: np.ndarray = None  # i32 [D, MAX_LODS]
    # transform row (pos, scale, quat): ONE 32B row gather per command/cluster
    draw_xform_row: np.ndarray = None  # f32 [D, 8]

    # per-triangle opacity masks for alpha-tested meshes (cooker/opacity.py):
    # channel-major [Ma, 8, 128] — 4 mask halves + uv rect (zero idu
    # => no alpha test), lanes 96-127 zero (f32 DMA slices want 128 lanes).
    # Ma == 1 (zeros) when nothing is alpha-tested; the index clamp makes
    # the gather free then.
    meshlet_alpha: np.ndarray = None  # f32 [Ma, 8, 2*MESH_MAXVTX]

    # material factors (reference Material, scene.h:25-37; texture indices
    # join when the bindless texture table lands)
    mat_diffuse: np.ndarray = None  # f32 [NM,4]
    mat_specular: np.ndarray = None  # f32 [NM,4]
    mat_emissive: np.ndarray = None  # f32 [NM,3]
    mat_textures: np.ndarray = None  # i32 [NM,4] albedo/normal/specular/emissive (+1-based into the texture table; 0 = none)
    # material megarow [NM, 20] f32: 0-3 diffuse, 4-7 specular, 8-10
    # emissive, 11-14 tex ids (as float, exact below 2^24), 15 albedo mip-0
    # texel area, 16-19 albedo analytic-addressing metadata (mip-0 pool
    # offset, w, h, mip count — render/textures.sample `meta` path).  The
    # dense shading paths gather this ONE row per pixel instead of 4
    # separate per-material tables (per-pixel gathers cost ~13-20ms each
    # per 1080p plane on this chip, independent of row width).
    mat_row: np.ndarray = None  # f32 [NM, 20]

    meshlet_visibility_count: int = 0
    # static flag: opacity masks baked (meshlet_alpha is real, not the
    # 1-row zero placeholder) — gates the alpha-variant setup kernel
    has_alpha_masks: bool = False
    # static per-slot texture usage (albedo, normal, specular, emissive):
    # False slots skip their sample() gathers entirely at trace time
    texture_slots: tuple = (False, False, False, False)
    # static: mat_row cols 16-19 hold REAL albedo addressing metadata (a
    # texture table was present at upload) — gates the analytic-mip fast
    # path; without it those cols are white-dummy placeholders
    has_texture_meta: bool = False

    @property
    def num_draws(self) -> int:
        return len(self.draw_scale)

    def slice_draws(self, lo: int, hi: int):
        """A view of this scene restricted to draw ids [lo, hi) — all
        per-draw arrays sliced, shared mesh/meshlet/material tables.

        Use case: per-frame work proportional to an ANIMATED TAIL of the
        draw list (ops/sunmap.update_sun_map) — culling the tail scene
        costs [hi-lo], not [D].  Draw ids inside the sliced scene are
        local; anything keyed on global ids (visibility slots) must not
        cross the boundary (the sun-map path uses none)."""
        import dataclasses

        sliced = {
            f.name: getattr(self, f.name)[lo:hi]
            for f in dataclasses.fields(self)
            if f.name.startswith("draw_")
        }
        return dataclasses.replace(self, **sliced)

    @property
    def num_meshlets(self) -> int:
        return len(self.meshlet_radius)


def _build_cull_blocks(meshlets: Meshlets) -> np.ndarray:
    """[M, 512] f16: row m = channel-major cull data of meshlets m..m+63
    (channel c occupies lanes [c*64, (c+1)*64): cx cy cz radius ax ay az
    cutoff; zero padded past the end).  FLAT rows matter: a [M,64,8] table
    would be laid out with the minor dim padded 8->128 (16x HBM and gather
    waste); a 512-lane row is exactly 4 aligned lane tiles.  Cone axis/
    cutoff stay raw int8 values (exact in f16); cluster_cull divides by 127
    after the gather."""
    rows = np.concatenate(
        [
            meshlets.center.astype(np.float16),
            meshlets.radius.astype(np.float16)[:, None],
            meshlets.cone_axis.astype(np.float16),
            meshlets.cone_cutoff.astype(np.float16)[:, None],
        ],
        axis=-1,
    )  # [M, 8]
    m = len(rows)
    padded = np.concatenate([rows, np.zeros((TASK_WGSIZE, 8), np.float16)], axis=0)
    idx = np.arange(m)[:, None] + np.arange(TASK_WGSIZE)[None, :]
    block = padded[idx]  # [M, 64, 8]
    return np.ascontiguousarray(np.transpose(block, (0, 2, 1))).reshape(m, 8 * TASK_WGSIZE)


def _albedo_area_column(materials: dict, texture_table) -> np.ndarray:
    """[NM, 1] f32: each material's albedo mip-0 texel area (w*h), 1 when
    untextured or no table given (-> mip 0, matching the white dummy)."""
    nm = len(materials["diffuse"])
    col = np.ones((nm, 1), np.float32)
    if texture_table is None:
        return col
    ids = np.asarray(materials["textures"])[:, 0] + 1  # 1-based table ids
    mw = np.asarray(texture_table.mip_w)
    mh = np.asarray(texture_table.mip_h)
    ok = (ids > 0) & (ids < len(mw))
    safe = np.where(ok, ids, 0)
    col[:, 0] = np.where(ok, (mw[safe, 0] * mh[safe, 0]).astype(np.float32), 1.0)
    return col


def _albedo_meta_columns(materials: dict, texture_table) -> np.ndarray:
    """[NM, 4] f32: each material's albedo texture addressing metadata
    (mip-0 pool offset, mip-0 w, mip-0 h, mip count).  The texel pool lays
    mips out consecutively and every chain floor-halves, so the (offset, w,
    h) of ANY mip is computable from these four numbers with dense shifts —
    render/textures.sample's `meta` path, which removes the per-pixel
    mip_rows gather (~12 ns/px on this chip, one full [1080p] gather
    plane)."""
    nm = len(materials["diffuse"])
    cols = np.zeros((nm, 4), np.float32)
    cols[:, 1:4] = 1.0  # white dummy: 1x1, 1 mip (offset 0)
    if texture_table is None:
        return cols
    ids = np.asarray(materials["textures"])[:, 0] + 1
    ok = (ids > 0) & (ids < len(texture_table.mip_count))
    safe = np.where(ok, ids, 0)
    cols[:, 0] = texture_table.mip_offset[safe, 0]
    cols[:, 1] = texture_table.mip_w[safe, 0]
    cols[:, 2] = texture_table.mip_h[safe, 0]
    cols[:, 3] = texture_table.mip_count[safe]
    return cols.astype(np.float32)


def upload(
    geometry: Geometry,
    draws: Draws,
    materials: dict | None = None,
    alpha_masks: np.ndarray | None = None,
    texture_table=None,
) -> DeviceScene:
    """Build the static-shape device layout from cooked geometry + draws.

    `materials` is an optional dict with diffuse [NM,4] / specular [NM,4] /
    emissive [NM,3]; absent, a single default material is used (matte white,
    like the reference's untextured OBJ mode).  `alpha_masks` [M,96,8] comes
    from cooker.opacity.bake_opacity and enables raster-time alpha testing
    for postPass-1 draws.  Pass the render.textures.TextureTable (host-side)
    so each material's albedo mip-0 texel area can be baked into the
    megarow — the dense shading path then picks mips with zero extra
    gathers."""
    vis_count = assign_meshlet_visibility_offsets(draws, geometry.meshes)
    vertex_ids, tris = unpack_meshlet_refs(geometry)

    if materials is None:
        materials = {
            "diffuse": np.array([[1.0, 1.0, 1.0, 1.0]], dtype=np.float32),
            "specular": np.array([[0.0, 0.0, 0.0, 0.0]], dtype=np.float32),
            "emissive": np.zeros((1, 3), dtype=np.float32),
        }
    if "textures" not in materials:
        nm = len(materials["diffuse"])
        materials = dict(materials, textures=np.full((nm, 4), -1, dtype=np.int32))

    positions = geometry.vpos.astype(np.float32)
    normals = math3d.unpack_normal(geometry.vnorm)
    tangent_oct = (
        np.stack(
            [
                (geometry.vtan.astype(np.int32) >> 0) & 255,
                (geometry.vtan.astype(np.int32) >> 8) & 255,
            ],
            axis=-1,
        ).astype(np.float32)
        / 127.0
        - 1.0
    )
    tan_xyz = math3d.oct_decode(tangent_oct)
    tan_sign = np.where((geometry.vnorm & np.uint32(1 << 30)) != 0, -1.0, 1.0).astype(np.float32)
    tangents = np.concatenate([tan_xyz, tan_sign[:, None]], axis=-1)

    meshlet_vdata = np.concatenate(
        [positions[vertex_ids], normals[vertex_ids],
         geometry.vuv.astype(np.float32)[vertex_ids]], axis=-1
    )  # [M, 64, 8]

    # bf16-split channels for the fused setup kernel's one-hot corner fetch;
    # 2 bf16 components cover >=16 mantissa bits, lossless for the
    # fp16/snorm-quantized sources
    import ml_dtypes

    def split2(x):
        hi = x.astype(ml_dtypes.bfloat16).astype(np.float32)
        lo = x - hi
        return [hi.astype(ml_dtypes.bfloat16), lo.astype(ml_dtypes.bfloat16)]

    uvs32 = geometry.vuv.astype(np.float32)[vertex_ids]
    chan_parts = []
    for axis in range(3):
        chan_parts += split2(positions[vertex_ids][..., axis])
    for axis in range(3):
        chan_parts += split2(normals[vertex_ids][..., axis])
    for axis in range(2):
        chan_parts += split2(uvs32[..., axis])
    vid64 = vertex_ids.astype(np.int64)
    assert vid64.max(initial=0) < (1 << 24), "vertex ids exceed 24-bit channel encoding"
    chan_parts += [
        (vid64 & 255).astype(ml_dtypes.bfloat16),
        ((vid64 >> 8) & 255).astype(ml_dtypes.bfloat16),
        (vid64 >> 16).astype(ml_dtypes.bfloat16),
        np.zeros_like(vid64, dtype=ml_dtypes.bfloat16),
    ]
    # CHANNEL-major, PAIR-PACKED [M, 10, 128]: channel 2p in lanes 0-63 of
    # row p, channel 2p+1 in lanes 64-127.  A [*, 20, 64] bf16 table would
    # be padded 64->128 lanes by XLA's tiled layout, doubling both HBM
    # residency and the per-frame cluster gather; the 128-lane packing is
    # layout-tight and the kernel re-splits the halves with one-hot lane
    # dots (setup_fused._corner_fetch)
    meshlet_channels = np.ascontiguousarray(np.stack(chan_parts, axis=1)).reshape(
        -1, 10, 2 * MESH_MAXVTX
    )  # [M, 10, 128]
    # triangle corner ids as bf16 channels (ids < 64, exact) in rows 10-12,
    # lanes 0-95; rows 13-15 pad the row block to the 16-sublane bf16 DMA
    # tile.  One [16, 128] row per meshlet = one contiguous 4 KB DMA for the
    # fused setup kernel.
    M = meshlet_channels.shape[0]
    meshlet_setup_row = np.zeros((M, 16, 2 * MESH_MAXVTX), ml_dtypes.bfloat16)
    meshlet_setup_row[:, :10, :] = meshlet_channels
    meshlet_setup_row[:, 10:13, :MESH_MAXTRI] = np.transpose(
        tris.astype(ml_dtypes.bfloat16), (0, 2, 1)
    )

    if alpha_masks is not None:
        meshlet_alpha = np.zeros((M, 8, 2 * MESH_MAXVTX), np.float32)
        meshlet_alpha[:, :, :MESH_MAXTRI] = np.transpose(
            alpha_masks.astype(np.float32), (0, 2, 1)
        )  # channel-major, lanes 96-127 zero
    else:
        meshlet_alpha = np.zeros((1, 8, 2 * MESH_MAXVTX), np.float32)

    return DeviceScene(
        positions=positions,
        normals=normals,
        uvs=geometry.vuv.astype(np.float32),
        tangents=tangents,
        meshlet_vertices=vertex_ids,
        meshlet_tris=tris,
        meshlet_vdata=meshlet_vdata,
        meshlet_setup_row=meshlet_setup_row,
        meshlet_center=geometry.meshlets.center.astype(np.float32),
        meshlet_radius=geometry.meshlets.radius.astype(np.float32),
        meshlet_cone_axis=(geometry.meshlets.cone_axis.astype(np.float32) / 127.0),
        meshlet_cone_cutoff=(geometry.meshlets.cone_cutoff.astype(np.float32) / 127.0),
        meshlet_vertex_count=geometry.meshlets.vertex_count.astype(np.int32),
        meshlet_triangle_count=geometry.meshlets.triangle_count.astype(np.int32),
        meshlet_cull_blocks=_build_cull_blocks(geometry.meshlets),
        meshlet_cull_row=np.concatenate(
            [
                geometry.meshlets.center.astype(np.float32),
                geometry.meshlets.radius.astype(np.float32)[:, None],
                geometry.meshlets.cone_axis.astype(np.float32) / 127.0,
                geometry.meshlets.cone_cutoff.astype(np.float32)[:, None] / 127.0,
            ],
            axis=1,
        ),
        meshlet_alpha=meshlet_alpha,
        has_alpha_masks=alpha_masks is not None,
        mesh_center=geometry.meshes.center.astype(np.float32),
        mesh_radius=geometry.meshes.radius.astype(np.float32),
        mesh_lod_count=geometry.meshes.lod_count.astype(np.int32),
        lod_meshlet_offset=geometry.meshes.lod_meshlet_offset.astype(np.int32),
        lod_meshlet_count=geometry.meshes.lod_meshlet_count.astype(np.int32),
        lod_error=geometry.meshes.lod_error.astype(np.float32),
        draw_position=draws.position.astype(np.float32),
        draw_scale=draws.scale.astype(np.float32),
        draw_orientation=draws.orientation.astype(np.float32),
        draw_mesh_index=draws.mesh_index.astype(np.int32),
        draw_vis_offset=draws.meshlet_visibility_offset.astype(np.int32),
        draw_post_pass=draws.post_pass.astype(np.int32),
        draw_material_index=draws.material_index.astype(np.int32),
        draw_mesh_row=np.concatenate(
            [
                geometry.meshes.center.astype(np.float32)[draws.mesh_index],
                geometry.meshes.radius.astype(np.float32)[draws.mesh_index, None],
                geometry.meshes.lod_count.astype(np.float32)[draws.mesh_index, None],
                geometry.meshes.lod_error.astype(np.float32)[draws.mesh_index],
            ],
            axis=-1,
        ),
        draw_lod_meshlet_count=geometry.meshes.lod_meshlet_count.astype(np.int32)[draws.mesh_index],
        draw_lod_meshlet_offset=geometry.meshes.lod_meshlet_offset.astype(np.int32)[draws.mesh_index],
        draw_xform_row=np.concatenate(
            [
                draws.position.astype(np.float32),
                draws.scale.astype(np.float32)[:, None],
                draws.orientation.astype(np.float32),
            ],
            axis=-1,
        ),
        mat_diffuse=materials["diffuse"].astype(np.float32),
        mat_specular=materials["specular"].astype(np.float32),
        mat_emissive=materials["emissive"].astype(np.float32),
        # shift to 1-based table ids (0 = no texture, like the reference's
        # id-0 convention, mesh.frag.glsl:63)
        mat_textures=(materials["textures"].astype(np.int32) + 1),
        mat_row=np.concatenate(
            [
                materials["diffuse"].astype(np.float32),
                materials["specular"].astype(np.float32),
                materials["emissive"].astype(np.float32),
                (materials["textures"].astype(np.int32) + 1).astype(np.float32),
                _albedo_area_column(materials, texture_table),
                _albedo_meta_columns(materials, texture_table),
            ],
            axis=-1,
        ),
        texture_slots=tuple(
            bool((materials["textures"][:, i] >= 0).any()) for i in range(4)
        ),
        has_texture_meta=texture_table is not None,
        meshlet_visibility_count=vis_count,
    )
