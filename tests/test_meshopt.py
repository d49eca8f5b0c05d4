"""EXT_meshopt_compression codec tests: round-trips for all three modes and
the filters, plus an end-to-end compressed .glb through the scene loader
(VERDICT round-1 item 6; reference scene.cpp:405-471).

No meshoptimizer binary or upstream-compressed asset exists in this
environment, so compatibility is exercised by round-trip through the
module's own encoders (same wire structure: header bytes, group layouts,
fifo discipline, embedded codeaux table)."""

import json
import struct

import numpy as np
import pytest

from niagara_tpu.cooker import meshopt_codec as mc


def _rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------ vertex codec


@pytest.mark.parametrize("count,stride", [(1, 4), (16, 4), (255, 16), (300, 12), (1000, 48), (17, 256)])
def test_vertex_roundtrip_random(count, stride):
    r = _rng(count * 1000 + stride)
    v = r.integers(0, 256, (count, stride), dtype=np.uint8)
    enc = mc.encode_vertex_buffer(v)
    dec = mc.decode_vertex_buffer(enc, count, stride)
    np.testing.assert_array_equal(v, dec)


def test_vertex_roundtrip_smooth_compresses():
    """Smooth data (small deltas) must round-trip AND beat raw size."""
    t = np.linspace(0, 4 * np.pi, 2000, dtype=np.float32)
    pos = np.stack([np.sin(t), np.cos(t), t * 0.01], axis=1)
    q = np.round(pos * 1000).astype(np.int16)  # quantized positions
    v = np.ascontiguousarray(q).view(np.uint8).reshape(2000, 6)
    # pad stride to 8 (codec is stride-agnostic; this mimics a padded vertex)
    v = np.concatenate([v, np.zeros((2000, 2), np.uint8)], axis=1)
    enc = mc.encode_vertex_buffer(v)
    dec = mc.decode_vertex_buffer(enc, 2000, 8)
    np.testing.assert_array_equal(v, dec)
    assert len(enc) < v.nbytes * 0.6, (len(enc), v.nbytes)


def test_vertex_header_and_tail_layout():
    v = np.arange(64, dtype=np.uint8).reshape(4, 16)
    enc = mc.encode_vertex_buffer(v)
    assert enc[0] == 0xA0  # meshopt vertex codec v0 header
    assert enc[-16:] == v[0].tobytes()  # first vertex rides in the tail
    with pytest.raises(ValueError):
        mc.decode_vertex_buffer(b"\x13" + enc[1:], 4, 16)


# ------------------------------------------------------------- index codec


def _grid_indices(w, h):
    """Typical mesh topology: shared-edge triangle grid."""
    tris = []
    for y in range(h):
        for x in range(w):
            a = y * (w + 1) + x
            tris += [[a, a + 1, a + w + 1], [a + 1, a + w + 2, a + w + 1]]
    return np.array(tris, np.uint32).reshape(-1)


def _assert_tris_equal_cyclic(a, b):
    """Triangle lists equal up to per-triangle cyclic rotation (the codec's
    edge-fifo alignment may rotate a triangle; winding and attributes are
    invariant under rotation so rendering is bit-identical)."""
    ta, tb = a.reshape(-1, 3), b.reshape(-1, 3)

    def canon(t):
        r = np.argmin(t, axis=1)
        return np.stack([t[np.arange(len(t)), (r + k) % 3] for k in range(3)], axis=1)

    np.testing.assert_array_equal(canon(ta), canon(tb))


def test_index_roundtrip_grid():
    idx = _grid_indices(17, 11)
    enc = mc.encode_index_buffer(idx)
    assert enc[0] == 0xE1  # triangle codec v1
    dec = mc.decode_index_buffer(enc, idx.shape[0])
    _assert_tris_equal_cyclic(idx, dec)
    # shared-edge topology must compress well below 4 bytes/index
    assert len(enc) < idx.shape[0] * 2


def test_index_roundtrip_random():
    r = _rng(7)
    idx = r.integers(0, 5000, 3 * 500, dtype=np.uint32)
    enc = mc.encode_index_buffer(idx)
    dec = mc.decode_index_buffer(enc, idx.shape[0])
    _assert_tris_equal_cyclic(idx, dec)


def test_index_sequence_roundtrip():
    r = _rng(9)
    seq = r.integers(0, 1 << 20, 777, dtype=np.uint32)
    enc = mc.encode_index_sequence(seq)
    assert enc[0] == 0xD1
    dec = mc.decode_index_sequence(enc, 777)
    np.testing.assert_array_equal(seq, dec)


# ----------------------------------------------------------------- filters


def test_filter_oct_unit_vectors():
    """Octahedral filter output must be unit-length snorm vectors that agree
    with the encoded direction."""
    r = _rng(3)
    n = r.normal(size=(100, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    # octahedral-encode at 16 bits (inverse of the filter's decode)
    ax = np.abs(n).sum(axis=1)
    u, v = n[:, 0] / ax, n[:, 1] / ax
    neg = n[:, 2] < 0
    u2 = np.where(neg, (1 - np.abs(v)) * np.sign(u), u)
    v2 = np.where(neg, (1 - np.abs(u)) * np.sign(v), v)
    enc = np.zeros((100, 4), np.int16)
    enc[:, 0] = np.round(u2 * 32767)
    enc[:, 1] = np.round(v2 * 32767)
    enc[:, 2] = 32767  # K = 1
    dec = mc.decode_filter_oct(enc)
    out = dec[:, :3].astype(np.float32) / 32767.0
    ln = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=2e-4)
    dots = np.sum(out * n, axis=1)
    assert dots.min() > 0.9999


def test_filter_quat_unit():
    r = _rng(4)
    q = r.normal(size=(50, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mi = np.argmax(np.abs(q), axis=1)
    sign = np.sign(q[np.arange(50), mi])
    q *= sign[:, None]  # max component positive
    s = np.float32(np.sqrt(2.0) / 2.0)
    enc = np.zeros((50, 4), np.int16)
    for i in range(50):
        rest = [(mi[i] + 1 + k) % 4 for k in range(3)]
        enc[i, 0] = np.round(q[i, rest[0]] / 2 / s * 32767)
        enc[i, 1] = np.round(q[i, rest[1]] / 2 / s * 32767)
        enc[i, 2] = np.round(q[i, rest[2]] / 2 / s * 32767)
        enc[i, 3] = (0 << 2) | mi[i]
    dec = mc.decode_filter_quat(enc).astype(np.float32) / 32767.0
    ln = np.linalg.norm(dec, axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=3e-4)
    dots = np.abs(np.sum(dec * q, axis=1))
    assert dots.min() > 0.9999


def test_filter_exp():
    vals = np.array([1.0, -2.5, 3.14159, 1e-4, -123456.0], np.float32)
    # encode: choose exponent so mantissa fits 24 signed bits
    enc = np.zeros(5, np.uint32)
    for i, v in enumerate(vals):
        e = max(int(np.ceil(np.log2(abs(v)))) - 23, -100) if v != 0 else 0
        m = int(round(v / 2.0**e))
        while not -(1 << 23) <= m < (1 << 23):
            e += 1
            m = int(round(v / 2.0**e))
        enc[i] = ((e & 0xFF) << 24) | (m & 0xFFFFFF)
    dec = mc.decode_filter_exp(enc)
    np.testing.assert_allclose(dec, vals, rtol=2e-7)


# ----------------------------------------------------- end-to-end glb load


def _write_compressed_glb(path):
    """Minimal .glb: one quad, positions+normals meshopt-ATTRIBUTES
    compressed, indices TRIANGLES compressed."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint32)  # CCW when viewed from +z

    vtx = np.concatenate([pos, nrm, uv], axis=1).astype(np.float32)
    vbytes = np.ascontiguousarray(vtx).view(np.uint8).reshape(4, 32)
    venc = mc.encode_vertex_buffer(vbytes)
    ienc = mc.encode_index_buffer(idx)

    def pad4(b):
        return b + b"\x00" * (-len(b) % 4)

    venc_p, ienc_p = pad4(venc), pad4(ienc)
    bin_chunk = venc_p + ienc_p

    j = {
        "asset": {"version": "2.0"},
        "extensionsUsed": ["EXT_meshopt_compression"],
        "extensionsRequired": ["EXT_meshopt_compression"],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {  # decompressed vertex view (no fallback buffer content)
                "buffer": 0, "byteLength": 128, "byteStride": 32,
                "extensions": {"EXT_meshopt_compression": {
                    "buffer": 0, "byteOffset": 0, "byteLength": len(venc),
                    "byteStride": 32, "count": 4, "mode": "ATTRIBUTES"}},
            },
            {
                "buffer": 0, "byteLength": 24,
                "extensions": {"EXT_meshopt_compression": {
                    "buffer": 0, "byteOffset": len(venc_p), "byteLength": len(ienc),
                    "byteStride": 4, "count": 6, "mode": "TRIANGLES"}},
            },
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 24, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 1, "componentType": 5125, "count": 6, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    jb = json.dumps(j).encode()
    jb += b" " * (-len(jb) % 4)
    total = 12 + 8 + len(jb) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(jb), 0x4E4F534A))
        f.write(jb)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


def test_compressed_glb_loads(tmp_path):
    from niagara_tpu.cooker import gltf

    path = str(tmp_path / "quad_meshopt.glb")
    _write_compressed_glb(path)
    sd = gltf.load_scene(path)
    assert sd.geometry.meshes.count == 1
    assert sd.draws.mesh_index.shape[0] == 1
    # the quad survived the codec: meshlets were built from real triangles
    assert sd.geometry.meshlets.count >= 1


# ------------------------------------------------- wire-format byte fixtures
# Hand-derived from the meshoptimizer v1 wire format (the spec the decoders
# implement; no upstream binary exists in this environment, so these pin the
# byte layout itself: header bytes, code nibbles, fifo disciplines, zigzag
# vbyte stream, embedded codeaux table).


def test_triangle_codec_byte_fixture():
    """(0,1,2) is the all-next fast path -> code 0xF0 (codeaux table entry 0
    = 0x00); (2,1,3) hits edge-fifo entry 1 ((c,b)=(2,1) pushed second) with
    c == next -> code 0x10.  No varint data; table rides the last 16 bytes."""
    tris = np.array([0, 1, 2, 2, 1, 3], np.uint32)
    enc = mc.encode_index_buffer(tris)
    expected = bytes([0xE1, 0xF0, 0x10]) + bytes(mc._CODEAUX_TABLE)
    assert enc == expected
    np.testing.assert_array_equal(mc.decode_index_buffer(expected, 6), tris)


def test_triangle_codec_explicit_index_fixture():
    """A lone far triangle (100, 200, 300): edge miss, nothing in fifos,
    a/b/c all explicit -> code 0xFF, aux byte 0xFF (feb=fec=15), then three
    zigzag vbyte deltas vs last=0: 200, 400-200=...  deltas 100, 100, 100
    -> zigzag 200 = 0xC8 0x01 each."""
    tris = np.array([100, 200, 300], np.uint32)
    enc = mc.encode_index_buffer(tris)
    zz100 = bytes([0xC8, 0x01])  # vbyte(zigzag32(+100)) = vbyte(200)
    expected = bytes([0xE1, 0xFF, 0xFF]) + zz100 * 3 + bytes(mc._CODEAUX_TABLE)
    assert enc == expected
    np.testing.assert_array_equal(mc.decode_index_buffer(expected, 3), tris)


def test_triangle_codec_last_delta_codes():
    """fec 13/14 encode c = last-1 / last+1 (v1 only).  Build a stream where
    an edge-fifo hit's third vertex is exactly last+1."""
    # tri0 establishes last=100 via explicit codes; tri1 reuses edge (b,a)
    # of tri0... construct: tri0 = (100, 200, 300) -> last=300.
    # tri1 shares edge (300, 200) = (c,b) of tri0 with third vertex 301.
    tris = np.array([100, 200, 300, 300, 200, 301], np.uint32)
    enc = mc.encode_index_buffer(tris)
    # tri1: edge fifo after tri0 (most recent first): (100,300),(300,200),
    # (200,100); rotation (300,200,301) hits entry 1 -> fe=1; c=301=last+1
    # -> fec=14 -> code 0x1E
    assert enc[2] == 0x1E
    np.testing.assert_array_equal(mc.decode_index_buffer(enc, 6), tris)


def test_sequence_codec_byte_fixture():
    """Two-baseline scheme: low vbyte bit selects baseline, rest is zigzag
    delta vs that baseline."""
    seq = np.array([0, 1, 2, 0], np.uint32)
    enc = mc.encode_index_sequence(seq)
    # 0: base0 delta 0 -> (zz0<<1)|0 = 0x00; 1: base0 delta +1 -> (2<<1)|0 =
    # 0x04; 2: base0 delta +1 -> 0x04; 0: base1 (|0-0| < |0-2|) delta 0 ->
    # (0<<1)|1 = 0x01
    assert enc == bytes([0xD1, 0x00, 0x04, 0x04, 0x01])
    np.testing.assert_array_equal(mc.decode_index_sequence(enc, 4), seq)


def test_vertex_codec_byte_fixture():
    """Stride-4 lane deltas: lane 0 of [0,1,3,2] zigzags to [0,2,4,1] ->
    2-bit group (header code 1) with one escape byte for the 4; zero lanes
    are 0-bit groups (header 0, no body); first vertex rides the 32-byte
    tail."""
    v = np.zeros((4, 4), np.uint8)
    v[:, 0] = [0, 1, 3, 2]
    enc = mc.encode_vertex_buffer(v)
    expected = bytes(
        [0xA0,
         0x01,                    # lane 0 group header: bits=2 (code 1)
         0x2D, 0x00, 0x00, 0x00,  # packed 2-bit values 0,2,3(esc),1 then 0s
         0x04,                    # escape byte for the clamped 4
         0x00, 0x00, 0x00]        # lanes 1-3: 0-bit groups
    ) + bytes(32)                 # tail: first vertex 0,0,0,0 in last 4
    assert enc == expected
    np.testing.assert_array_equal(mc.decode_vertex_buffer(expected, 4, 4), v)


def test_rotation_unobservable():
    """The triangle codec restores each triangle up to a winding-preserving
    cyclic rotation.  Rotation is unobservable downstream: the rasterizer's
    coverage and fragment ids are rotation-invariant (the same three edge
    functions are ANDed; the fragment id is the flat triangle index), and
    depth planes agree to fp-addition reassociation."""
    # consistently-wound quad grid: adjacent triangles share edges in
    # opposite directions, so the edge fifo matches a non-identity rotation
    tris = []
    for q in range(20):
        b = 2 * q
        tris += [(b, b + 1, b + 2), (b + 1, b + 3, b + 2)]
    tris = np.asarray(tris, np.uint32)
    dec = mc.decode_index_buffer(mc.encode_index_buffer(tris.reshape(-1)), tris.size).reshape(-1, 3)
    rotated = 0
    for o, d in zip(tris, dec):
        rots = [tuple(np.roll(o, -k)) for k in range(3)]
        assert tuple(d) in rots, (o, d)
        rotated += tuple(d) != tuple(o)
    assert rotated > 0  # the fifo path did rotate some — the caveat is real

    # raster invariance: same quad with rotated corner order -> identical
    # coverage and fragment ids, depth equal to ulp-reassociation
    import jax.numpy as jnp
    from niagara_tpu.config import MESH_MAXTRI, MESH_MAXVTX
    from niagara_tpu.ops import raster, raster_tile

    W, H = 128, 8

    def setup(rot):
        verts = np.zeros((MESH_MAXVTX, 2), np.float32)
        verts[:3] = [[3, 1], [97, 2], [50, 7]]
        tri = np.zeros((MESH_MAXTRI, 3), np.int32)
        tri[0] = np.roll([0, 2, 1], rot)
        tv = np.zeros(MESH_MAXTRI, bool)
        tv[0] = True
        zw = np.array([0.3, 0.5, 0.7] + [0.0] * (MESH_MAXVTX - 3), np.float32)
        zr = np.roll(zw[:3], 0)  # depth per VERTEX follows the ids, not slots
        tc = dict(
            tri_valid=jnp.array(tv[None]), vid=jnp.zeros((1, MESH_MAXVTX), jnp.int32),
            hx=jnp.array(verts[None, :, 0]), hy=jnp.array(verts[None, :, 1]),
            zw=jnp.array(zw[None]), viewz=jnp.ones((1, MESH_MAXVTX), jnp.float32),
            normal=jnp.zeros((1, MESH_MAXVTX, 3), jnp.float32),
            uv=jnp.zeros((1, MESH_MAXVTX, 2), jnp.float32),
            tri=jnp.array(tri[None]), draw_id=jnp.zeros(1, jnp.int32),
            mat_index=jnp.zeros(1, jnp.int32), post_pass=jnp.zeros(1, jnp.int32),
        )
        st = raster.compact_setup(tc, W, H, 0.1, 64)
        depth = jnp.zeros((1, raster_tile.TILE_H, raster_tile.TILE_W), jnp.float32)
        vis = jnp.full((1, raster_tile.TILE_H, raster_tile.TILE_W), raster.INVALID_FRAG, jnp.int32)
        d, vi, _ = raster_tile.rasterize_tiles(
            st, depth, vis, tiles_x=1, tiles_y=1, pair_capacity=128, interpret=True)
        return np.asarray(d[0]), np.asarray(vi[0])

    d0, v0 = setup(0)
    d1, v1 = setup(1)
    np.testing.assert_array_equal(v0 != raster.INVALID_FRAG, v1 != raster.INVALID_FRAG)
    np.testing.assert_allclose(d0, d1, atol=1e-6)
