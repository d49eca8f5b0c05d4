import base64
import json
import struct

import numpy as np
import pytest

from niagara_tpu.cooker import gltf
from niagara_tpu.utils import math3d


def make_test_gltf(tmp_path, animated=False):
    """Two nodes sharing one cube mesh; one rotated+scaled; 2 materials;
    a perspective camera and a directional + point light."""
    # cube: 8 verts, 12 tris
    verts = np.array(
        [
            [x, y, z]
            for x in (-1, 1)
            for y in (-1, 1)
            for z in (-1, 1)
        ],
        dtype=np.float32,
    )
    normals = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    tris = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        dtype=np.uint16,
    )

    pos_bytes = verts.tobytes()
    nrm_bytes = normals.astype(np.float32).tobytes()
    idx_bytes = tris.tobytes()
    buffer = pos_bytes + nrm_bytes + idx_bytes

    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "uri": "data:application/octet-stream;base64," + base64.b64encode(buffer).decode(),
                "byteLength": len(buffer),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes)},
            {"buffer": 0, "byteOffset": len(pos_bytes), "byteLength": len(nrm_bytes)},
            {"buffer": 0, "byteOffset": len(pos_bytes) + len(nrm_bytes), "byteLength": len(idx_bytes)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 8, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 8, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 36, "type": "SCALAR"},
        ],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2, "material": 0}
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                    "roughnessFactor": 0.4,
                },
                "emissiveFactor": [0.1, 0.0, 0.0],
            },
            {"pbrMetallicRoughness": {"baseColorFactor": [0, 1, 0, 0.4]}, "alphaMode": "MASK"},
        ],
        "cameras": [{"type": "perspective", "perspective": {"yfov": 0.9, "znear": 0.05}}],
        "extensions": {
            "KHR_lights_punctual": {
                "lights": [
                    {"type": "directional", "intensity": 3.0},
                    {"type": "point", "color": [1, 0.5, 0.2], "intensity": 7.0, "range": 12.0},
                ]
            }
        },
        "extensionsUsed": ["KHR_lights_punctual"],
        "nodes": [
            {"mesh": 0, "translation": [1, 2, 3]},
            {"mesh": 0, "translation": [-4, 0, 0], "rotation": [0, 0.7071068, 0, 0.7071068], "scale": [2, 2, 2]},
            {"camera": 0, "translation": [0, 1, 10]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}}},
            {"extensions": {"KHR_lights_punctual": {"light": 1}}, "translation": [5, 5, 5]},
        ],
        "scenes": [{"nodes": [0, 1, 2, 3, 4]}],
        "scene": 0,
    }

    if animated:
        times = np.array([0.0, 1.0, 2.0], dtype=np.float32)
        values = np.array([[0, 0, 0], [0, 5, 0], [0, 0, 0]], dtype=np.float32)
        anim_buf = times.tobytes() + values.tobytes()
        doc["buffers"].append(
            {
                "uri": "data:application/octet-stream;base64," + base64.b64encode(anim_buf).decode(),
                "byteLength": len(anim_buf),
            }
        )
        doc["bufferViews"] += [
            {"buffer": 1, "byteOffset": 0, "byteLength": 12},
            {"buffer": 1, "byteOffset": 12, "byteLength": 36},
        ]
        doc["accessors"] += [
            {"bufferView": 3, "componentType": 5126, "count": 3, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 3, "type": "VEC3"},
        ]
        doc["animations"] = [
            {
                "samplers": [{"input": 3, "output": 4, "interpolation": "LINEAR"}],
                "channels": [{"sampler": 0, "target": {"node": 0, "path": "translation"}}],
            }
        ]

    path = tmp_path / "test.gltf"
    path.write_text(json.dumps(doc))
    return str(path)


def test_load_scene_basics(tmp_path):
    scene = gltf.load_scene(make_test_gltf(tmp_path))
    g = scene.geometry

    assert g.meshes.count == 1  # one primitive cooked once, shared by 2 draws
    assert scene.draws.count == 2
    np.testing.assert_allclose(scene.draws.position[0], [1, 2, 3])
    np.testing.assert_allclose(scene.draws.position[1], [-4, 0, 0])
    assert scene.draws.scale[1] == pytest.approx(2.0)
    # rotation quaternion preserved (y-axis 90deg)
    v = math3d.rotate_quat(np.array([1.0, 0, 0]), scene.draws.orientation[1])
    np.testing.assert_allclose(v, [0, 0, -1], atol=1e-5)

    # cube geometry: 12 tris at LOD0, sane bounds
    assert g.meshes.lod_index_count[0, 0] == 36
    assert g.meshes.radius[0] == pytest.approx(np.sqrt(3), rel=1e-2)

    # materials
    np.testing.assert_allclose(scene.materials["diffuse"][0], [0.8, 0.2, 0.1, 1.0])
    assert scene.materials["specular"][0, 3] == pytest.approx(0.6)  # 1 - roughness
    np.testing.assert_allclose(scene.materials["emissive"][0], [0.1, 0, 0])
    # second material is alpha-masked -> but the cube uses material 0
    assert scene.draws.post_pass[0] == 0

    # camera + lights
    np.testing.assert_allclose(scene.camera_position, [0, 1, 10])
    assert scene.camera_fov_y == pytest.approx(0.9)
    np.testing.assert_allclose(scene.sun_direction, [0, 0, 1], atol=1e-6)  # identity light node
    assert len(scene.lights["range"]) == 1
    np.testing.assert_allclose(scene.lights["position"][0], [5, 5, 5])
    assert scene.lights["intensity"][0] == pytest.approx(7.0)


def test_load_scene_renders(tmp_path):
    """End-to-end: glTF -> upload -> one frame."""
    import jax.numpy as jnp

    from niagara_tpu import scene as scene_mod
    from niagara_tpu.render import frame as frame_mod
    from niagara_tpu.render.camera import Camera, RenderSettings
    from niagara_tpu.ops.raster import INVALID_FRAG

    sd = gltf.load_scene(make_test_gltf(tmp_path))
    ds = scene_mod.upload(sd.geometry, sd.draws, sd.materials)

    cfg = frame_mod.FrameConfig(
        width=128, height=128, max_groups=1,
        cmd_capacity=64, cluster_capacity=64,
        small_capacity=1 << 12, big_capacity=32, pair_capacity=1 << 12,
        raster_interpret=True, bloom=False,
    )
    cam = Camera(
        position=np.array(sd.camera_position, dtype=np.float32),
        orientation=np.array(sd.camera_orientation, dtype=np.float32),
        fov_y=sd.camera_fov_y,
    )
    params, sp = frame_mod.make_frame_inputs(cam, RenderSettings(), cfg, sun_direction=sd.sun_direction)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    image, fb, state, stats = frame_mod.render_frame(ds, state, params, sp, cfg)
    vis = np.asarray(fb.vis)
    assert (vis != INVALID_FRAG).sum() > 50  # cubes visible
    # shaded color reflects the red-ish material
    img = np.asarray(image)
    covered = vis != INVALID_FRAG
    assert img[covered][:, 0].mean() > img[covered][:, 2].mean()


def test_animation_resampling(tmp_path):
    sd = gltf.load_scene(make_test_gltf(tmp_path, animated=True))
    at = sd.animations
    assert at.draw_index.shape[0] == 1
    assert at.draw_index[0] == 0
    assert at.key_count[0] >= 2

    from niagara_tpu.render import animation

    # at t=1.0 the translation should be ~[0, 5, 0]
    _, pos, scale, orient, active = animation.evaluate(at, jnp_time(1.0))
    np.testing.assert_allclose(np.asarray(pos[0]), [0, 5, 0], atol=0.2)
    # at t=0 back at origin
    _, pos0, _, _, _ = animation.evaluate(at, jnp_time(0.0))
    np.testing.assert_allclose(np.asarray(pos0[0]), [0, 0, 0], atol=0.2)


def jnp_time(t):
    import jax.numpy as jnp

    return jnp.float32(t)


def test_alpha_textured_scene_bakes_and_renders(tmp_path):
    """End-to-end content path: glTF with an alpha-MASK textured material ->
    texture load -> opacity bake -> upload -> frame render (post pass on)."""
    import jax
    import jax.numpy as jnp

    from niagara_tpu.cooker.opacity import bake_opacity
    from niagara_tpu.render import frame as frame_mod, textures as tex_mod
    from niagara_tpu.render.camera import Camera, RenderSettings
    from niagara_tpu import scene as scene_mod
    from tests.test_textures import write_dds_rgba

    # quad with uvs, alpha-MASK material with a baseColorTexture
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    nrm = np.tile([0, 0, 1.0], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint16)
    buf = verts.tobytes() + nrm.tobytes() + uv.tobytes() + tris.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "data:application/octet-stream;base64," + base64.b64encode(buf).decode(),
                     "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}},
            "alphaMode": "MASK",
        }],
        "textures": [{"source": 0}],
        "images": [{"uri": "cut.png"}],
        "nodes": [{"mesh": 0, "translation": [0, 0, -4]}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    path = tmp_path / "alpha.gltf"
    path.write_text(json.dumps(doc))

    # texture: left half transparent (the loader rewrites cut.png -> cut.dds)
    img = np.zeros((16, 16, 4), np.uint8)
    img[:, :, :3] = 200
    img[:, 8:, 3] = 255
    write_dds_rgba(str(tmp_path / "cut.dds"), img)

    sd = gltf.load_scene(str(path))
    assert sd.texture_paths == ["cut.dds"]
    assert int(sd.draws.post_pass[0]) == 1

    mips = tex_mod.load_texture_mips(sd.texture_paths, base_dir=str(tmp_path))
    masks = bake_opacity(sd.geometry, sd.draws, sd.materials, mips)
    assert masks is not None
    live = masks[..., 6] > 0
    assert live.any(), "alpha-tested triangles must get masks"
    # left-transparent: some cells transparent, some opaque
    packed = (masks[live][:, :4].astype(np.uint64) << (16 * np.arange(4, dtype=np.uint64))).sum(1)
    assert (packed != 0).any() and (packed != 0xFFFFFFFFFFFFFFFF).any()

    table = tex_mod.build_texture_table(mips=mips)
    ds = scene_mod.upload(sd.geometry, sd.draws, sd.materials, masks)
    cfg = frame_mod.FrameConfig(
        width=256, height=144, max_groups=2, cmd_capacity=64, cluster_capacity=64,
        small_capacity=1 << 10, big_capacity=16, pair_capacity=1 << 10,
        tri_capacity=256, post_passes=2, raster_interpret=True, bloom=False,
    )
    params, sp = frame_mod.make_frame_inputs(Camera(), RenderSettings(), cfg)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    scene = jax.device_put(ds)
    for _ in range(2):
        image, fb, state, stats = frame_mod.render_frame(
            scene, state, params, sp, cfg, textures=jax.device_put(table)
        )
    vis = np.asarray(fb.vis) != 0x7FFFFFFF
    assert vis.any(), "quad must rasterize"

    # reference render without masks: the full quad footprint
    ds_plain = scene_mod.upload(sd.geometry, sd.draws, sd.materials, None)
    state_p = frame_mod.init_state(ds_plain.num_draws, ds_plain.meshlet_visibility_count)
    scene_p = jax.device_put(ds_plain)
    for _ in range(2):
        _, fb_p, state_p, _ = frame_mod.render_frame(scene_p, state_p, params, sp, cfg)
    vis_p = np.asarray(fb_p.vis) != 0x7FFFFFFF
    x_all = np.nonzero(vis_p.any(axis=0))[0]
    x_cut = np.nonzero(vis.any(axis=0))[0]
    mid = (x_all.min() + x_all.max()) / 2
    # masked render: roughly half the footprint, all right of the quad center
    assert vis.sum() < 0.6 * vis_p.sum(), (vis.sum(), vis_p.sum())
    assert x_cut.min() >= mid - 1, (x_cut.min(), mid)


def test_scene_cache_roundtrip(tmp_path):
    """load_scene(cache_dir=...) must write a versioned snapshot on the
    first call and reproduce the cooked scene EXACTLY from it on the second
    (role of the reference's scenecache.cpp for the glTF path — the
    per-primitive cook is the expensive step repeat runs skip)."""
    import numpy as np

    path = make_test_gltf(tmp_path, animated=True)
    cache = str(tmp_path / "cache")
    a = gltf.load_scene(path, cache_dir=cache)
    import os
    assert any(f.endswith(".scene.npz") for f in os.listdir(cache))
    b = gltf.load_scene(path, cache_dir=cache)

    for k in gltf._DRAW_FIELDS:
        np.testing.assert_array_equal(getattr(a.draws, k), getattr(b.draws, k))
    for k in a.materials:
        np.testing.assert_array_equal(a.materials[k], b.materials[k])
    for k in gltf._ANIM_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a.animations, k)), np.asarray(getattr(b.animations, k)))
    assert a.texture_paths == b.texture_paths
    np.testing.assert_array_equal(a.sun_direction, b.sun_direction)
    if a.camera_position is not None:
        np.testing.assert_array_equal(a.camera_position, b.camera_position)
        np.testing.assert_array_equal(a.camera_orientation, b.camera_orientation)
        assert a.camera_fov_y == b.camera_fov_y
    # geometry: compare the full cooked array set
    from niagara_tpu.cooker.cook import _geometry_to_dict
    ga, gb = _geometry_to_dict(a.geometry), _geometry_to_dict(b.geometry)
    assert ga.keys() == gb.keys()
    for k in ga:
        np.testing.assert_array_equal(ga[k], gb[k])
