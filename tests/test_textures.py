import struct

import numpy as np
import pytest

import jax.numpy as jnp

from niagara_tpu.cooker import bindings
from niagara_tpu.render import textures as tex_mod


def write_dds_bc1(path, blocks_wh, color565=(31, 63, 31)):
    """Solid-color BC1 DDS: blocks_wh in 4px blocks; every block c0==c1==color,
    all indices 0 -> every texel decodes to expand(color565)."""
    bw, bh = blocks_wh
    w, h = bw * 4, bh * 4
    c = (color565[0] << 11) | (color565[1] << 5) | color565[2]
    block = struct.pack("<HHI", c, c, 0)
    header = bytearray(128)
    header[0:4] = b"DDS "
    struct.pack_into("<I", header, 4, 124)
    struct.pack_into("<I", header, 8, 0x1007)  # caps|height|width|pixelformat
    struct.pack_into("<I", header, 12, h)
    struct.pack_into("<I", header, 16, w)
    struct.pack_into("<I", header, 28, 1)  # mips
    struct.pack_into("<I", header, 76, 32)
    struct.pack_into("<I", header, 80, 0x4)  # FOURCC
    header[84:88] = b"DXT1"
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(block * (bw * bh))
    return w, h


def write_dds_rgba(path, img):
    h, w = img.shape[:2]
    header = bytearray(128)
    header[0:4] = b"DDS "
    struct.pack_into("<I", header, 4, 124)
    struct.pack_into("<I", header, 8, 0x1007)
    struct.pack_into("<I", header, 12, h)
    struct.pack_into("<I", header, 16, w)
    struct.pack_into("<I", header, 28, 1)
    struct.pack_into("<I", header, 76, 32)
    struct.pack_into("<I", header, 80, 0x41)  # RGB | ALPHAPIXELS
    struct.pack_into("<I", header, 88, 32)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(np.ascontiguousarray(img, dtype=np.uint8).tobytes())


def test_bc1_decode_solid(tmp_path):
    path = str(tmp_path / "t.dds")
    write_dds_bc1(path, (2, 2), color565=(31, 0, 0))  # pure red
    mips, fmt = bindings.load_dds(path)
    assert fmt == 1
    img = mips[0]
    assert img.shape == (8, 8, 4)
    np.testing.assert_array_equal(img[..., 0], 255)
    np.testing.assert_array_equal(img[..., 1], 0)
    np.testing.assert_array_equal(img[..., 3], 255)


def test_bc1_interpolated_colors(tmp_path):
    # c0 = white > c1 = black; index pattern: texel i uses index i%4
    path = str(tmp_path / "t2.dds")
    c0 = 0xFFFF
    c1 = 0x0000
    idx = 0
    for i in range(16):
        idx |= (i % 4) << (2 * i)
    header_img = struct.pack("<HHI", c0, c1, idx)
    header = bytearray(128)
    header[0:4] = b"DDS "
    struct.pack_into("<I", header, 4, 124)
    struct.pack_into("<I", header, 12, 4)
    struct.pack_into("<I", header, 16, 4)
    struct.pack_into("<I", header, 28, 1)
    struct.pack_into("<I", header, 76, 32)
    struct.pack_into("<I", header, 80, 0x4)
    header[84:88] = b"DXT1"
    open(path, "wb").write(bytes(header) + header_img)
    mips, fmt = bindings.load_dds(path)
    img = mips[0]
    # row-major texels: index pattern 0,1,2,3 repeating
    np.testing.assert_array_equal(img[0, 0], [255, 255, 255, 255])
    np.testing.assert_array_equal(img[0, 1], [0, 0, 0, 255])
    np.testing.assert_allclose(img[0, 2][:3], [170, 170, 170], atol=2)  # 2/3 white
    np.testing.assert_allclose(img[0, 3][:3], [85, 85, 85], atol=2)  # 1/3 white


def test_rgba_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(8, 16, 4), dtype=np.uint8)
    path = str(tmp_path / "t3.dds")
    write_dds_rgba(path, img)
    mips, fmt = bindings.load_dds(path)
    assert fmt == 6
    np.testing.assert_array_equal(mips[0], img)


def test_texture_table_sample(tmp_path):
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, :4] = [255, 0, 0, 255]
    img[:, 4:] = [0, 0, 255, 255]
    path = str(tmp_path / "t4.dds")
    write_dds_rgba(path, img)

    table = tex_mod.build_texture_table([path])
    # id 0 = white dummy
    white = tex_mod.sample(table, jnp.array([[0]]), jnp.array([[[0.5, 0.5]]]), jnp.array([[0]]))
    np.testing.assert_allclose(np.asarray(white)[0, 0], [1, 1, 1, 1])
    # id 1 = the texture: left half red, right half blue (nearest)
    left = tex_mod.sample(table, jnp.array([[1]]), jnp.array([[[0.25, 0.5]]]), jnp.array([[0]]), bilinear=False)
    right = tex_mod.sample(table, jnp.array([[1]]), jnp.array([[[0.75, 0.5]]]), jnp.array([[0]]), bilinear=False)
    np.testing.assert_allclose(np.asarray(left)[0, 0], [1, 0, 0, 1])
    np.testing.assert_allclose(np.asarray(right)[0, 0], [0, 0, 1, 1])
    # repeat wrap
    wrapped = tex_mod.sample(table, jnp.array([[1]]), jnp.array([[[1.25, 0.5]]]), jnp.array([[0]]), bilinear=False)
    np.testing.assert_allclose(np.asarray(wrapped)[0, 0], [1, 0, 0, 1])


def test_textured_render(tmp_path):
    """glTF cube with a red BC1 base color texture renders red-ish."""
    import jax
    from test_gltf import make_test_gltf
    import json

    from niagara_tpu import scene as scene_mod
    from niagara_tpu.cooker import gltf
    from niagara_tpu.render import frame as frame_mod
    from niagara_tpu.render.camera import Camera, RenderSettings
    from niagara_tpu.ops.raster import INVALID_FRAG

    dds_path = str(tmp_path / "red.dds")
    write_dds_bc1(dds_path, (4, 4), color565=(31, 0, 0))

    gltf_path = make_test_gltf(tmp_path)
    doc = json.loads(open(gltf_path).read())
    doc["images"] = [{"uri": "red.dds"}]
    doc["textures"] = [{"source": 0}]
    doc["materials"][0]["pbrMetallicRoughness"]["baseColorFactor"] = [1, 1, 1, 1]
    doc["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    # give the cube uvs: reuse normals accessor shape? simplest: set TEXCOORD_0
    # to the normal accessor (vec3 sliced as vec2 is invalid) -> instead add a
    # vec2 accessor aliasing positions xy normalized; easier: skip uvs — the
    # loader leaves uv=0 and sampling still fetches texel (0,0), which is red.
    open(gltf_path, "w").write(json.dumps(doc))

    sd = gltf.load_scene(gltf_path)
    assert sd.texture_paths == ["red.dds"]
    ds = scene_mod.upload(sd.geometry, sd.draws, sd.materials)
    table = tex_mod.build_texture_table(sd.texture_paths, base_dir=str(tmp_path))

    cfg = frame_mod.FrameConfig(
        width=128, height=128, max_groups=1,
        cmd_capacity=64, cluster_capacity=64,
        small_capacity=1 << 12, big_capacity=32, pair_capacity=1 << 12,
        tri_capacity=1 << 10, late_cluster_capacity=64, late_tri_capacity=1 << 10,
        raster_interpret=True, bloom=False,
    )
    cam = Camera(position=np.array(sd.camera_position, dtype=np.float32))
    params, sp = frame_mod.make_frame_inputs(cam, RenderSettings(), cfg)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    image, fb, state, stats = frame_mod.render_frame(ds, state, params, sp, cfg, textures=table)
    vis = np.asarray(fb.vis)
    covered = vis != INVALID_FRAG
    assert covered.sum() > 50
    img = np.asarray(image)
    # strongly red: red channel much greater than green/blue
    assert img[covered][:, 0].mean() > 3 * img[covered][:, 1].mean()


def write_dds_bc7(path, w, h, payload):
    """BC7 DDS with DX10 header (dxgi 98 = BC7_UNORM)."""
    linear = ((w + 3) // 4) * ((h + 3) // 4) * 16
    hdr = struct.pack("<I I I I I I I", 124, 0x1007 | 0x80000, h, w, linear, 0, 1)
    hdr += b"\0" * 44
    pf = struct.pack("<I I 4s I I I I I", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    caps = struct.pack("<I I I I I", 0x1000, 0, 0, 0, 0)
    dx10 = struct.pack("<I I I I I", 98, 3, 0, 1, 0)
    with open(path, "wb") as f:
        f.write(b"DDS " + hdr + pf + caps + dx10 + payload)


def test_bc7_decode_matches_pillow(tmp_path):
    """Fuzz the from-spec BC7 decoder (bc7.cpp) against Pillow's independent
    BC7 implementation: bit-exact on random blocks across all 8 modes."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    rng = np.random.default_rng(0xBC7)
    W = H = 64
    nblocks = (W // 4) * (H // 4)
    path = str(tmp_path / "t.dds")
    for _ in range(4):
        payload = rng.integers(0, 256, nblocks * 16, dtype=np.uint8)
        # avoid reserved mode-8 blocks (first byte 0): decoders may differ
        first = payload[::16]
        first[first == 0] = 1
        write_dds_bc7(path, W, H, payload.tobytes())
        mips, fmt = bindings.load_dds(path)
        assert fmt == 7
        ref = np.asarray(Image.open(io.BytesIO(open(path, "rb").read())).convert("RGBA"))
        np.testing.assert_array_equal(mips[0], ref)


def test_texture_budget_drops_fine_mips(tmp_path):
    """The texel-pool byte budget drops the finest mips uniformly until the
    pool fits (HBM bound for Bistro-class texture sets)."""
    from niagara_tpu.render import textures as tex_mod

    path = str(tmp_path / "big.dds")
    write_dds_bc1(path, (16, 16))  # 64x64, 1 mip
    full = tex_mod.build_texture_table([path, path], budget_bytes=None)
    assert int(full.mip_w[1, 0]) == 64

    # two 64x64 RGBA8 = 32KB; budget of 10KB forces... single-mip textures
    # can't shrink, so build a mip chain by loading with max_dim
    chain = [np.full((1, 1, 4), 255, np.uint8)]
    # synthesize a chain via repeated writes at smaller sizes: use the
    # budget path directly on multi-mip content from the BC7 helper
    payload = np.zeros(((32 // 4) * (32 // 4)) * 16, np.uint8)
    payload[::16] = 0x20  # mode 5 solid-ish blocks
    # full-mip DDS: 32x32 + 16x16 + ... write mip chain manually
    import struct as _s

    w = h = 32
    mips = 4
    linear = (w // 4) * (h // 4) * 16
    hdr = _s.pack("<I I I I I I I", 124, 0x1007 | 0x20000 | 0x80000, h, w, linear, 0, mips)
    hdr += b"\0" * 44
    pf = _s.pack("<I I 4s I I I I I", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    caps = _s.pack("<I I I I I", 0x1000 | 0x400008, 0, 0, 0, 0)
    dx10 = _s.pack("<I I I I I", 98, 3, 0, 1, 0)
    body = b""
    mw, mh = w, h
    rng = np.random.default_rng(3)
    for _ in range(mips):
        nb = max(mw // 4, 1) * max(mh // 4, 1)
        blk = rng.integers(1, 255, nb * 16, dtype=np.uint8)
        body += blk.tobytes()
        mw, mh = max(mw // 2, 1), max(mh // 2, 1)
    p2 = str(tmp_path / "chain.dds")
    open(p2, "wb").write(b"DDS " + hdr + pf + caps + dx10 + body)

    t_full = tex_mod.build_texture_table([p2], budget_bytes=None)
    assert int(t_full.mip_w[1, 0]) == 32 and int(t_full.mip_count[1]) == 4
    t_cut = tex_mod.build_texture_table([p2], budget_bytes=2000)
    assert int(t_cut.mip_w[1, 0]) <= 16  # finest mip dropped
    assert int(t_cut.mip_count[1]) < 4


def write_dds_bc6h(path, w, h, payload, signed=False):
    pf = struct.pack("<I I 4s I I I I I", 32, 0x4, b"DX10", 0, 0, 0, 0, 0)
    linear = ((w + 3) // 4) * ((h + 3) // 4) * 16
    hdr = struct.pack("<I I I I I I I", 124, 0x1007 | 0x80000, h, w, linear, 0, 1) + b"\0" * 44
    caps = struct.pack("<I I I I I", 0x1000, 0, 0, 0, 0)
    dx10 = struct.pack("<I I I I I", 96 if signed else 95, 3, 0, 1, 0)
    with open(path, "wb") as f:
        f.write(b"DDS " + hdr + pf + caps + dx10 + payload)


def test_bc6h_unsigned_matches_pillow(tmp_path):
    """BC6H_UF16 fuzz vs Pillow's independent decoder (all mode families).
    Tolerance 2/255: the two half->8bit conversions round differently."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    rng = np.random.default_rng(0xBC6)
    W = H = 32
    nb = (W // 4) * (H // 4)
    path = str(tmp_path / "t.dds")
    from niagara_tpu.cooker import bindings

    for _ in range(4):
        payload = rng.integers(0, 256, nb * 16, dtype=np.uint8)
        write_dds_bc6h(path, W, H, payload.tobytes())
        mips, fmt = bindings.load_dds(path)
        assert fmt == 8
        ref = np.asarray(Image.open(io.BytesIO(open(path, "rb").read())).convert("RGB"))
        np.testing.assert_allclose(
            mips[0][..., :3].astype(int), ref.astype(int), atol=2
        )


def test_bc6h_signed_mode10_analytic():
    """BC6H_SF16 spec oracle on a crafted raw-endpoint (mode 10) block:
    10-bit signed endpoints, known indices -> exact half values.
    (Pillow's SF16 path disagrees with the spec, so the oracle is analytic.)"""
    import ctypes

    from niagara_tpu.cooker.bindings import get_lib

    lib = get_lib()
    lib.ck_decode_bc6h_block.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int
    ]

    def put(bits, pos, val, n):
        for i in range(n):
            if (val >> i) & 1:
                bits |= 1 << (pos + i)
        return bits, pos + n

    # endpoints: rw=+200, gw=-200 (10-bit two's complement), bw=511 (max)
    # rx=+100, gx=-100, bx=0; indices: texel0 anchor (3 bits)=0, others=15
    bits, pos = 0, 0
    bits, pos = put(bits, pos, 0b00011, 5)  # mode 11 code (LSB first: 1,1,0,0,0)
    for v in (200, (-200) & 1023, 511, 100, (-100) & 1023, 0):
        bits, pos = put(bits, pos, v, 10)
    bits, pos = put(bits, pos, 0, 3)  # anchor index (t0): 0
    for _ in range(15):
        bits, pos = put(bits, pos, 15, 4)
    blk = bits.to_bytes(16, "little")

    out = (ctypes.c_uint16 * 48)()
    lib.ck_decode_bc6h_block(blk, out, 1)
    halves = np.array(out[:], np.uint16).reshape(16, 3)
    f = np.frombuffer(halves.tobytes(), np.float16).astype(np.float32).reshape(16, 3)

    def unq_signed(v, bits=10):
        s = v < 0
        v = abs(v)
        if v == 0:
            u = 0
        elif v >= (1 << (bits - 1)) - 1:
            u = 0x7FFF
        else:
            u = ((v << 15) + 0x4000) >> (bits - 1)
        return -u if s else u

    def finish(v):
        v = -(((-v) * 31) >> 5) if v < 0 else (v * 31) >> 5
        return np.frombuffer(
            np.uint16((0x8000 | -v) if v < 0 else v).tobytes(), np.float16
        )[0]

    w4 = [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64]
    for t in range(16):
        wgt = w4[0] if t == 0 else w4[15]
        for c, (e0, e1) in enumerate(((200, 100), (-200, -100), (511, 0))):
            a, b = unq_signed(e0), unq_signed(e1)
            v = (a * (64 - wgt) + b * wgt + 32) >> 6
            assert f[t, c] == pytest.approx(float(finish(v)), abs=1e-6), (t, c)


def test_analytic_mip_addressing_matches_table():
    """textures.sample's `meta` path (analytic offset/w/h from mip-0
    metadata, no mip_rows gather) must be bit-identical to the table-driven
    path across textures, mips (incl. past-the-chain clamping), and
    non-square/non-pow2 sizes."""
    import numpy as np
    import jax.numpy as jnp
    from niagara_tpu.render import textures as tex_mod

    rng = np.random.default_rng(3)
    mips_list = []
    for (w, h) in [(64, 64), (128, 32), (6, 10), (1, 1), (56, 56)]:
        img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        chain = [img]
        while max(chain[-1].shape[0], chain[-1].shape[1]) > 1:
            m = chain[-1]
            chain.append(m[::2, ::2])
        mips_list.append(chain)
    table = tex_mod.build_texture_table(mips=mips_list)

    n = 4096
    tid = jnp.asarray(rng.integers(0, len(mips_list) + 1, n), jnp.int32)
    uv = jnp.asarray(rng.random((n, 2)) * 3.0 - 1.0, jnp.float32)
    mip = jnp.asarray(rng.integers(0, tex_mod.MAX_MIPS, n), jnp.int32)

    mo = np.asarray(table.mip_offset)
    mw = np.asarray(table.mip_w)
    mh = np.asarray(table.mip_h)
    mc = np.asarray(table.mip_count)
    t = np.asarray(tid)
    meta = (
        jnp.asarray(mo[t, 0]), jnp.asarray(mw[t, 0]),
        jnp.asarray(mh[t, 0]), jnp.asarray(mc[t]),
    )
    a = np.asarray(tex_mod.sample(table, tid, uv, mip))
    b = np.asarray(tex_mod.sample(table, tid, uv, mip, meta=meta))
    np.testing.assert_array_equal(a, b)
