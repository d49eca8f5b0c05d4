"""Procedural glTF city end-to-end (cooker/synth_city.py).

Pins the full glTF production path at Bistro-like *structure* (many textured
materials, MASK-mode foliage, street-canyon occlusion): generate .glb + DDS
set -> parse -> C++ cook -> opacity bake -> bindless table -> two-pass
culled, textured, alpha-classed frame.  Also the regression test for the
NaN-contamination bug this scene exposed: one non-finite value in ANY record
slot (even an invalid one — here: uninitialized opacity scratch of non-post
clusters) poisoned whole record chunks through the setup kernel's one-hot
placement dots (0 * NaN = NaN).
"""

import numpy as np
import pytest

import jax

from niagara_tpu.cooker import gltf, synth_city
from niagara_tpu.cooker.opacity import bake_opacity
from niagara_tpu.render import frame as frame_mod
from niagara_tpu.render import textures as tex_mod
from niagara_tpu.render.camera import Camera, RenderSettings
from niagara_tpu.scene import upload


@pytest.fixture(scope="module")
def city(tmp_path_factory):
    out = tmp_path_factory.mktemp("city")
    # reduced city: 16 blocks, coarser facades — same structure, test-sized
    glb = synth_city.generate_city(str(out), blocks=4, facade_seg=8, tex_size=64)
    sd = gltf.load_scene(glb)
    mips = tex_mod.load_texture_mips(sd.texture_paths, base_dir=str(out))
    masks = bake_opacity(sd.geometry, sd.draws, sd.materials, mips)
    table = tex_mod.build_texture_table(mips=mips)
    ds = upload(sd.geometry, sd.draws, sd.materials, masks, texture_table=table)
    return sd, ds, table


def test_city_structure(city):
    sd, ds, table = city
    assert len(sd.materials["diffuse"]) >= 100, "Bistro-class material count"
    assert len(sd.texture_paths) >= 100
    assert (sd.draws.post_pass == 1).sum() > 20, "alpha-cutout foliage present"
    assert ds.has_alpha_masks and ds.texture_slots[0]
    assert sd.camera_position is not None


def test_city_renders_finite_and_loss_free(city):
    sd, ds, table = city
    cfg = frame_mod.FrameConfig(
        width=256, height=128, max_groups=8,
        cmd_capacity=1 << 10, cluster_capacity=1 << 12,
        candidate_capacity=1 << 13, late_candidate_capacity=1 << 13,
        pair_capacity=1 << 15, tri_capacity=1 << 14,
        late_cluster_capacity=1 << 11, late_tri_capacity=1 << 13,
        post_passes=2, bloom=False, raster_interpret=True,
    )
    cam = Camera(position=sd.camera_position, orientation=sd.camera_orientation)
    params, sp = frame_mod.make_frame_inputs(
        cam, RenderSettings(), cfg, sun_direction=sd.sun_direction)
    state = frame_mod.init_state(ds.num_draws, ds.meshlet_visibility_count)
    for _ in range(2):
        image, fb, state, stats = frame_mod.render_frame(
            ds, state, params, sp, cfg, textures=jax.device_put(table))
    img = np.asarray(image)
    vis = np.asarray(fb.vis)
    covered = (vis != 0x7FFFFFFF).sum()
    assert covered > 1000, "street canyon visible"
    # the NaN regression: every covered pixel must shade finite
    assert np.isfinite(img).all(), f"{(~np.isfinite(img).all(-1)).sum()} NaN px"
    assert (img.sum(-1) > 0.02).sum() > 500, "textured surfaces lit"
    for d in (stats.cmd_dropped, stats.cluster_dropped, stats.tri_dropped, stats.pair_dropped):
        assert int(d) == 0
    # occlusion culling is doing real work: far draws culled
    assert int(stats.visible_draws) < ds.num_draws
