"""Scene cooking: OBJ -> Geometry, with a versioned binary cache.

Mirrors the reference flow loadMesh -> appendMesh accumulation
(reference scene.cpp:281-293, niagara.cpp:849-894) and the scene-cache
behavior of scenecache.cpp (versioned snapshot invalidated by source file
mtime/size hash, fileutils.cpp:107-114).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import MAX_LODS
from ..scene import Geometry, Meshes, Meshlets
from ..utils import math3d
from . import bindings

CACHE_VERSION = 3


def _hash_file_meta(path: str) -> int:
    """mtime xor size hash (role of reference hashFileMeta fileutils.cpp:107-114)."""
    st = os.stat(path)
    return (int(st.st_mtime_ns) ^ (st.st_size << 32)) & 0xFFFFFFFFFFFFFFFF


def _assemble(meshes_cooked: list[dict]) -> Geometry:
    """Concatenate per-mesh cooked arrays into one Geometry, fixing up
    base-vertex / data-offset / index-offset / meshlet-offset fields the way
    the reference's shared Geometry accumulation does."""
    n = len(meshes_cooked)

    vertex_offset = 0
    index_offset = 0
    meshlet_offset = 0
    data_offset = 0

    all_vertices = []
    all_indices = []
    all_meshlets = []
    all_data = []

    mesh_center = np.zeros((n, 3), dtype=np.float32)
    mesh_radius = np.zeros(n, dtype=np.float32)
    mesh_vertex_offset = np.zeros(n, dtype=np.uint32)
    mesh_vertex_count = np.zeros(n, dtype=np.uint32)
    mesh_lod_count = np.zeros(n, dtype=np.uint32)
    mesh_lod_rt = np.zeros(n, dtype=np.uint32)
    lod_index_offset = np.zeros((n, MAX_LODS), dtype=np.uint32)
    lod_index_count = np.zeros((n, MAX_LODS), dtype=np.uint32)
    lod_meshlet_offset = np.zeros((n, MAX_LODS), dtype=np.uint32)
    lod_meshlet_count = np.zeros((n, MAX_LODS), dtype=np.uint32)
    lod_error = np.zeros((n, MAX_LODS), dtype=np.float32)

    for mi, cooked in enumerate(meshes_cooked):
        verts = cooked["vertices"]
        idx = cooked["indices"].astype(np.uint32)
        meshlets = cooked["meshlets"].copy()
        data = cooked["meshlet_data"]

        meshlets["data_offset"] += np.uint32(data_offset)
        meshlets["base_vertex"] += np.uint32(vertex_offset)

        mesh_center[mi] = cooked["center"]
        mesh_radius[mi] = cooked["radius"]
        mesh_vertex_offset[mi] = vertex_offset
        mesh_vertex_count[mi] = len(verts)
        mesh_lod_count[mi] = cooked["lod_count"]
        mesh_lod_rt[mi] = cooked["lod_rt"]
        for li, lod in enumerate(cooked["lods"]):
            lod_index_offset[mi, li] = lod["index_offset"] + index_offset
            lod_index_count[mi, li] = lod["index_count"]
            lod_meshlet_offset[mi, li] = lod["meshlet_offset"] + meshlet_offset
            lod_meshlet_count[mi, li] = lod["meshlet_count"]
            lod_error[mi, li] = lod["error"]

        all_vertices.append(verts)
        all_indices.append(idx + np.uint32(vertex_offset))
        all_meshlets.append(meshlets)
        all_data.append(data)

        vertex_offset += len(verts)
        index_offset += len(idx)
        meshlet_offset += len(meshlets)
        data_offset += len(data)

    vertices = np.concatenate(all_vertices) if all_vertices else np.empty(0, dtype=bindings.VERTEX_DTYPE)
    meshlets_arr = np.concatenate(all_meshlets) if all_meshlets else np.empty(0, dtype=bindings.MESHLET_DTYPE)

    meshlets = Meshlets(
        center=math3d.dequantize_half(np.ascontiguousarray(meshlets_arr["center"])),
        radius=math3d.dequantize_half(np.ascontiguousarray(meshlets_arr["radius"])),
        cone_axis=np.ascontiguousarray(meshlets_arr["cone_axis"]),
        cone_cutoff=np.ascontiguousarray(meshlets_arr["cone_cutoff"]),
        data_offset=np.ascontiguousarray(meshlets_arr["data_offset"]),
        base_vertex=np.ascontiguousarray(meshlets_arr["base_vertex"]),
        vertex_count=np.ascontiguousarray(meshlets_arr["vertex_count"]),
        triangle_count=np.ascontiguousarray(meshlets_arr["triangle_count"]),
        short_refs=np.ascontiguousarray(meshlets_arr["short_refs"]),
    )

    meshes = Meshes(
        center=mesh_center,
        radius=mesh_radius,
        vertex_offset=mesh_vertex_offset,
        vertex_count=mesh_vertex_count,
        lod_count=mesh_lod_count,
        lod_rt=mesh_lod_rt,
        lod_index_offset=lod_index_offset,
        lod_index_count=lod_index_count,
        lod_meshlet_offset=lod_meshlet_offset,
        lod_meshlet_count=lod_meshlet_count,
        lod_error=lod_error,
    )

    vpos = np.stack(
        [math3d.dequantize_half(vertices["vx"]), math3d.dequantize_half(vertices["vy"]), math3d.dequantize_half(vertices["vz"])],
        axis=-1,
    ).astype(np.float16)
    vuv = np.stack(
        [math3d.dequantize_half(vertices["tu"]), math3d.dequantize_half(vertices["tv"])], axis=-1
    ).astype(np.float16)

    return Geometry(
        vpos=vpos,
        vnorm=np.ascontiguousarray(vertices["np"]),
        vtan=np.ascontiguousarray(vertices["tp"]),
        vuv=vuv,
        indices=np.concatenate(all_indices) if all_indices else np.empty(0, dtype=np.uint32),
        meshlet_data=np.concatenate(all_data) if all_data else np.empty(0, dtype=np.uint32),
        meshlets=meshlets,
        meshes=meshes,
    )


def cook_obj_meshes(paths: list[str], max_scale: float = 1.0, build_lods: bool = True) -> Geometry:
    """Cook one or more OBJ files, one mesh each (reference niagara.cpp:893-894
    loadMesh per argv)."""
    cooked = []
    for path in paths:
        flat = bindings.load_obj(path)
        indices = np.arange(len(flat), dtype=np.uint32)
        cooked.append(bindings.cook_mesh(flat, indices, max_scale=max_scale, build_lods=build_lods))
    return _assemble(cooked)


# ------------------------------------------------------------- scene cache


def _geometry_to_dict(g: Geometry) -> dict:
    out = {
        "vpos": g.vpos,
        "vnorm": g.vnorm,
        "vtan": g.vtan,
        "vuv": g.vuv,
        "indices": g.indices,
        "meshlet_data": g.meshlet_data,
    }
    for k, v in vars(g.meshlets).items():
        out[f"ml_{k}"] = v
    for k, v in vars(g.meshes).items():
        out[f"me_{k}"] = v
    return out


def _geometry_from_dict(d: dict) -> Geometry:
    meshlets = Meshlets(**{k[3:]: d[k] for k in d if k.startswith("ml_")})
    meshes = Meshes(**{k[3:]: d[k] for k in d if k.startswith("me_")})
    return Geometry(
        vpos=d["vpos"],
        vnorm=d["vnorm"],
        vtan=d["vtan"],
        vuv=d["vuv"],
        indices=d["indices"],
        meshlet_data=d["meshlet_data"],
        meshlets=meshlets,
        meshes=meshes,
    )


def save_scene_cache(cache_path: str, geometry: Geometry, source_hash: int) -> None:
    """Versioned snapshot of cooked geometry (role of saveSceneCache,
    reference scenecache.cpp:119-271)."""
    arrays = _geometry_to_dict(geometry)
    arrays["__meta__"] = np.array([CACHE_VERSION, source_hash & 0xFFFFFFFF, source_hash >> 32], dtype=np.uint64)
    np.savez(cache_path, **arrays)


def load_scene_cache(cache_path: str, source_hash: int) -> Geometry | None:
    """Load the cache if present and valid, else None (role of loadSceneCache,
    reference scenecache.cpp:273-370)."""
    if not os.path.exists(cache_path):
        return None
    try:
        with np.load(cache_path) as data:
            meta = data["__meta__"]
            if int(meta[0]) != CACHE_VERSION:
                return None
            stored = int(meta[1]) | (int(meta[2]) << 32)
            if stored != (source_hash & 0xFFFFFFFFFFFFFFFF):
                return None
            return _geometry_from_dict({k: data[k] for k in data.files if k != "__meta__"})
    except Exception:
        return None


def cook_or_load(paths: list[str], cache_dir: str | None = None, build_lods: bool = True) -> Geometry:
    """Cook with cache: hashed against the source files' mtime+size."""
    source_hash = CACHE_VERSION
    for p in paths:
        source_hash ^= _hash_file_meta(p)

    cache_path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        name = "_".join(os.path.basename(p) for p in paths) + ".cache.npz"
        cache_path = os.path.join(cache_dir, name)
        cached = load_scene_cache(cache_path, source_hash)
        if cached is not None:
            return cached

    geometry = cook_obj_meshes(paths, build_lods=build_lods)
    if cache_path is not None:
        save_scene_cache(cache_path, geometry, source_hash)
    return geometry
