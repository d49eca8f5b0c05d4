"""ctypes bindings for the native cooker (libcooker.so).

Builds the shared library on demand (make) and exposes numpy-friendly
wrappers around the C ABI in native/cooker.h.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcooker.so")

_lock = threading.Lock()
_lib = None

# numpy dtype mirroring CkVertex (16 bytes, reference scene.h:60-66)
VERTEX_DTYPE = np.dtype(
    [
        ("vx", np.uint16),
        ("vy", np.uint16),
        ("vz", np.uint16),
        ("tp", np.uint16),
        ("np", np.uint32),
        ("tu", np.uint16),
        ("tv", np.uint16),
    ]
)
assert VERTEX_DTYPE.itemsize == 16

# numpy dtype mirroring CkMeshlet (24 bytes, reference scene.h:10-23)
MESHLET_DTYPE = np.dtype(
    [
        ("center", np.uint16, (3,)),
        ("radius", np.uint16),
        ("cone_axis", np.int8, (3,)),
        ("cone_cutoff", np.int8),
        ("data_offset", np.uint32),
        ("base_vertex", np.uint32),
        ("vertex_count", np.uint8),
        ("triangle_count", np.uint8),
        ("short_refs", np.uint8),
        ("padding", np.uint8),
    ]
)
assert MESHLET_DTYPE.itemsize == 24


class _CkLod(ctypes.Structure):
    _fields_ = [
        ("index_offset", ctypes.c_uint32),
        ("index_count", ctypes.c_uint32),
        ("meshlet_offset", ctypes.c_uint32),
        ("meshlet_count", ctypes.c_uint32),
        ("error", ctypes.c_float),
    ]


class _CkCooked(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.c_void_p),
        ("vertex_count", ctypes.c_uint32),
        ("indices", ctypes.c_void_p),
        ("index_count", ctypes.c_uint32),
        ("meshlets", ctypes.c_void_p),
        ("meshlet_count", ctypes.c_uint32),
        ("meshlet_data", ctypes.c_void_p),
        ("meshlet_data_count", ctypes.c_uint32),
        ("center", ctypes.c_float * 3),
        ("radius", ctypes.c_float),
        ("lod_count", ctypes.c_uint32),
        ("lod_rt", ctypes.c_uint32),
        ("lods", _CkLod * 16),
    ]


def _build_library() -> None:
    sources = [
        os.path.join(_NATIVE_DIR, f)
        for f in ("cooker.cpp", "meshlet.cpp", "simplify.cpp", "bvh.cpp", "textures.cpp", "cooker.h", "half.h", "Makefile")
    ]
    if os.path.exists(_LIB_PATH):
        lib_mtime = os.path.getmtime(_LIB_PATH)
        # strict comparison: equal mtimes (fresh checkout) force a rebuild so
        # we never trust a binary whose provenance we can't verify
        if all(os.path.getmtime(s) < lib_mtime for s in sources):
            return
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            _build_library()
            lib = ctypes.CDLL(_LIB_PATH)

            lib.ck_load_obj.restype = ctypes.c_uint32
            lib.ck_load_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p)]
            lib.ck_free_vertices.argtypes = [ctypes.c_void_p]

            lib.ck_cook_mesh.restype = ctypes.POINTER(_CkCooked)
            lib.ck_cook_mesh.argtypes = [
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_float,
                ctypes.c_int,
            ]
            lib.ck_free_cooked.argtypes = [ctypes.POINTER(_CkCooked)]

            lib.ck_generate_vertex_remap.restype = ctypes.c_uint32
            lib.ck_generate_vertex_remap.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]

            lib.ck_optimize_vertex_cache.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]

            lib.ck_meshlet_bound.restype = ctypes.c_uint32
            lib.ck_meshlet_bound.argtypes = [ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]

            lib.ck_build_meshlets.restype = ctypes.c_uint32
            lib.ck_build_meshlets.argtypes = [
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_float,
                ctypes.c_uint32,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
            ]

            lib.ck_compute_meshlet_bounds.argtypes = [
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_void_p,
            ]

            lib.ck_simplify.restype = ctypes.c_uint32
            lib.ck_simplify.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_void_p,
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]

            lib.ck_simplify_scale.restype = ctypes.c_float
            lib.ck_simplify_scale.argtypes = [ctypes.c_void_p, ctypes.c_uint32]

            _lib = lib
    return _lib


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


def load_obj(path: str) -> np.ndarray:
    """Parse + quantize an OBJ into a flat triangle-list vertex stream
    (structured array of VERTEX_DTYPE, 3 entries per triangle)."""
    lib = get_lib()
    out = ctypes.c_void_p()
    count = lib.ck_load_obj(path.encode(), ctypes.byref(out))
    if count == 0 or not out.value:
        raise IOError(f"failed to load OBJ: {path}")
    buf = ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * (count * 16)))
    arr = np.frombuffer(bytes(buf.contents), dtype=VERTEX_DTYPE).copy()
    lib.ck_free_vertices(out)
    return arr


def cook_mesh(vertices: np.ndarray, indices: np.ndarray, max_scale: float = 1.0, build_lods: bool = True) -> dict:
    """Cook one mesh; returns a dict of numpy arrays + mesh header fields."""
    lib = get_lib()
    vertices = np.ascontiguousarray(vertices, dtype=VERTEX_DTYPE)
    indices = np.ascontiguousarray(indices, dtype=np.uint32)

    cooked = lib.ck_cook_mesh(_ptr(vertices), len(vertices), _ptr(indices), len(indices), max_scale, int(build_lods))
    if not cooked:
        raise RuntimeError("ck_cook_mesh failed")
    c = cooked.contents

    def read(ptr, count, dtype):
        nbytes = count * dtype.itemsize
        if nbytes == 0:
            return np.empty(0, dtype=dtype)
        raw = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * nbytes))
        return np.frombuffer(bytes(raw.contents), dtype=dtype).copy()

    result = {
        "vertices": read(c.vertices, c.vertex_count, VERTEX_DTYPE),
        "indices": read(c.indices, c.index_count, np.dtype(np.uint32)),
        "meshlets": read(c.meshlets, c.meshlet_count, MESHLET_DTYPE),
        "meshlet_data": read(c.meshlet_data, c.meshlet_data_count, np.dtype(np.uint32)),
        "center": np.array(c.center[:], dtype=np.float32),
        "radius": float(c.radius),
        "lod_count": int(c.lod_count),
        "lod_rt": int(c.lod_rt),
        "lods": [
            {
                "index_offset": int(l.index_offset),
                "index_count": int(l.index_count),
                "meshlet_offset": int(l.meshlet_offset),
                "meshlet_count": int(l.meshlet_count),
                "error": float(l.error),
            }
            for l in c.lods[: c.lod_count]
        ],
    }
    lib.ck_free_cooked(cooked)
    return result


def build_meshlets(positions: np.ndarray, indices: np.ndarray, max_vertices: int = 64, max_triangles: int = 96, cone_weight: float = 0.25):
    """Direct meshlet build (unit-test entry)."""
    lib = get_lib()
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.uint32)
    bound = lib.ck_meshlet_bound(len(indices), max_vertices, max_triangles)
    n = 0xFFFFFFFF
    while n == 0xFFFFFFFF:
        mv = np.zeros((bound, max_vertices), dtype=np.uint32)
        mt = np.zeros((bound, max_triangles * 3), dtype=np.uint8)
        vc = np.zeros(bound, dtype=np.uint32)
        tc = np.zeros(bound, dtype=np.uint32)
        n = lib.ck_build_meshlets(
            _ptr(positions), len(positions), _ptr(indices), len(indices),
            max_vertices, max_triangles, ctypes.c_float(cone_weight), bound,
            _ptr(mv), _ptr(mt), _ptr(vc), _ptr(tc),
        )
        bound *= 2
    return mv[:n], mt[:n].reshape(n, max_triangles, 3), vc[:n], tc[:n]


def compute_meshlet_bounds(positions: np.ndarray, meshlet_vertices: np.ndarray, meshlet_triangles: np.ndarray) -> np.ndarray:
    lib = get_lib()
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    mv = np.ascontiguousarray(meshlet_vertices, dtype=np.uint32)
    mt = np.ascontiguousarray(meshlet_triangles, dtype=np.uint8).reshape(-1)
    out = np.zeros(8, dtype=np.float32)
    lib.ck_compute_meshlet_bounds(
        _ptr(positions), len(positions), _ptr(mv), len(mv), _ptr(mt), len(mt) // 3, _ptr(out)
    )
    return out


def simplify(indices: np.ndarray, positions: np.ndarray, target_index_count: int, target_error: float = 0.1):
    """Direct simplification (unit-test entry). Returns (indices, error)."""
    lib = get_lib()
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.uint32)
    dst = np.zeros_like(indices)
    err = ctypes.c_float()
    n = lib.ck_simplify(
        _ptr(dst), _ptr(indices), len(indices), _ptr(positions), len(positions),
        target_index_count, ctypes.c_float(target_error), ctypes.byref(err),
    )
    return dst[:n], float(err.value)


def simplify_scale(positions: np.ndarray) -> float:
    lib = get_lib()
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    return float(lib.ck_simplify_scale(_ptr(positions), len(positions)))


def build_bvh(positions: np.ndarray, indices: np.ndarray):
    """Skip-pointer BVH over a triangle soup.

    Returns (nodes [N,8] f32 — aabb min/max + skip/leaf as int bits,
    tri_order [T] u32 — leaf-order triangle permutation)."""
    lib = get_lib()
    if not hasattr(lib.ck_build_bvh, "argtypes") or lib.ck_build_bvh.argtypes is None:
        pass
    lib.ck_build_bvh.restype = ctypes.c_uint32
    lib.ck_build_bvh.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p,
    ]
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.uint32)
    tri_count = len(indices) // 3
    cap = max(2 * tri_count + 8, 64)
    n = 0xFFFFFFFF
    while n == 0xFFFFFFFF:
        nodes = np.zeros((cap, 8), dtype=np.float32)
        order = np.zeros(tri_count, dtype=np.uint32)
        n = lib.ck_build_bvh(_ptr(positions), len(positions), _ptr(indices), len(indices), _ptr(nodes), cap, _ptr(order))
        cap *= 2
    return nodes[:n], order


def build_bvh_boxes(boxes_min: np.ndarray, boxes_max: np.ndarray, max_leaf: int = 1):
    """Skip-pointer BVH over AABBs (the TLAS level; reference
    createTLAS/buildTLAS scenert.cpp:520-579).

    Returns (nodes [N,8] f32, order [B] u32 — leaf-order box permutation).
    Leaf info encodes first*16+count over `order`."""
    lib = get_lib()
    lib.ck_build_bvh_boxes.restype = ctypes.c_uint32
    lib.ck_build_bvh_boxes.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p,
    ]
    boxes = np.concatenate(
        [np.ascontiguousarray(boxes_min, np.float32), np.ascontiguousarray(boxes_max, np.float32)],
        axis=-1,
    )
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    count = len(boxes)
    if count == 0:
        return np.zeros((0, 8), np.float32), np.zeros(0, np.uint32)
    cap = max(2 * count + 8, 64)
    n = 0xFFFFFFFF
    while n == 0xFFFFFFFF:
        nodes = np.zeros((cap, 8), dtype=np.float32)
        order = np.zeros(count, dtype=np.uint32)
        n = lib.ck_build_bvh_boxes(_ptr(boxes), count, max_leaf, _ptr(nodes), cap, _ptr(order))
        cap *= 2
    return nodes[:n], order


def refit_bvh_boxes(nodes: np.ndarray, boxes_min: np.ndarray, boxes_max: np.ndarray) -> np.ndarray:
    """Topology-preserving bound update of a box BVH from build_bvh_boxes
    (the Vulkan MODE_UPDATE refit, reference niagara.cpp:1476-1482): new
    leaf boxes in the build's leaf `order`, node AABBs recomputed bottom-up.
    Returns the updated nodes array (a copy)."""
    lib = get_lib()
    lib.ck_refit_bvh_boxes.restype = None
    lib.ck_refit_bvh_boxes.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint32,
    ]
    nodes = np.ascontiguousarray(nodes, np.float32).copy()
    boxes = np.concatenate(
        [np.ascontiguousarray(boxes_min, np.float32), np.ascontiguousarray(boxes_max, np.float32)],
        axis=-1,
    )
    boxes = np.ascontiguousarray(boxes, np.float32)
    if len(nodes):
        lib.ck_refit_bvh_boxes(_ptr(nodes), len(nodes), _ptr(boxes), len(boxes))
    return nodes


def load_dds(path: str):
    """Decode a DDS texture (BC1-5 / RGBA8) to RGBA8 mips.

    Returns (mips: list of [h,w,4] uint8 arrays, format: int 1..6)."""
    lib = get_lib()
    lib.ck_load_dds.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.ck_load_dds.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.ck_free_rgba.argtypes = [ctypes.c_void_p]

    info = np.zeros(4, dtype=np.uint32)
    ptr = lib.ck_load_dds(path.encode(), _ptr(info))
    if not ptr:
        raise IOError(f"failed to load DDS (unsupported format?): {path}")
    w, h, mips, fmt = (int(v) for v in info)
    total = 0
    mw, mh = w, h
    dims = []
    for _ in range(mips):
        dims.append((mh, mw))
        total += mw * mh
        mw, mh = max(mw // 2, 1), max(mh // 2, 1)
    raw = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * (total * 4)))
    flat = np.frombuffer(bytes(raw.contents), dtype=np.uint8).copy()
    lib.ck_free_rgba(ptr)

    out = []
    off = 0
    for mh, mw in dims:
        out.append(flat[off * 4 : (off + mw * mh) * 4].reshape(mh, mw, 4))
        off += mw * mh
    return out, fmt
