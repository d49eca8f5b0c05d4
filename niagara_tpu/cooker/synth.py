"""Synthetic benchmark scene — bit-exact vs the reference's OBJ mode.

The reference's default benchmark scene scatters N draws of the loaded meshes
uniformly in a 300-unit cube with random scale/orientation, PCG32-seeded with
state 0x42 (niagara.cpp:969-998).  Reproducing the RNG stream exactly makes
culling-parity comparisons possible on identical scenes.
"""

from __future__ import annotations

import numpy as np

from ..scene import Draws
from ..utils.pcg import PCG_DEFAULT_INC, pcg32_sequence, rand01_from_bits

F = np.float32


def synthesize_draws(mesh_count: int, draw_count: int = 1_000_000, scene_radius: float = 300.0, seed: int = 0x42) -> Draws:
    """Generate the reference's random draw placement (niagara.cpp:969-998).

    Per draw the reference consumes exactly 9 RNG outputs in order:
    meshIndex(rand32), pos.xyz(3x rand01), scale(rand01), axis.xyz(3x rand01),
    angle(rand01).
    """
    n = draw_count
    bits = pcg32_sequence(9 * n, state=seed, inc=int(PCG_DEFAULT_INC)).reshape(n, 9)

    mesh_index = (bits[:, 0] % np.uint32(mesh_count)).astype(np.int32)

    r01 = rand01_from_bits(bits[:, 1:])  # f64 like the reference's rand01
    sr = F(scene_radius)

    # float(rand01()) * sceneRadius * 2 - sceneRadius, all-f32 arithmetic
    position = (r01[:, 0:3].astype(F) * (sr * F(2))) - sr
    scale = (r01[:, 3].astype(F) + F(1)) * F(2)

    axis_raw = r01[:, 4:7].astype(F) * F(2) - F(1)
    axis_len = np.sqrt(np.sum(axis_raw * axis_raw, axis=1, dtype=F)).astype(F)
    axis = axis_raw / axis_len[:, None]

    angle = np.radians(r01[:, 7].astype(F) * F(90)).astype(F)
    half = angle * F(0.5)
    # glm quat(w, axis*sin) with xyzw storage
    orientation = np.concatenate(
        [axis * np.sin(half, dtype=F)[:, None], np.cos(half, dtype=F)[:, None]], axis=1
    ).astype(F)

    return Draws(
        position=position.astype(F),
        scale=scale.astype(F),
        orientation=orientation,
        mesh_index=mesh_index,
        meshlet_visibility_offset=np.zeros(n, dtype=np.uint32),
        post_pass=np.zeros(n, dtype=np.int32),
        material_index=np.zeros(n, dtype=np.int32),
    )


def synthesize_planar_uvs(geometry, tiles: float = 6.0) -> None:
    """In-place: XZ-planar uv chart for meshes cooked from uv-less OBJs
    (kitten.obj has no vt records), normalized to [0, tiles] over the scene
    bounds.  Gives the synthetic benchmark scene real uv variation so
    textured shading exercises scattered gathers, not one hot texel."""
    pos = geometry.vpos.astype(np.float32)
    lo = pos.min(axis=0)
    ext = np.maximum(pos.max(axis=0) - lo, 1e-6)
    uv = (pos[:, [0, 2]] - lo[[0, 2]]) / ext[[0, 2]] * tiles
    geometry.vuv = uv.astype(np.float16)


def synthesize_materials(draw_count: int, num_materials: int = 8, tex_size: int = 256,
                         seed: int = 7):
    """Synthetic textured material set for the benchmark scene: checkerboard
    albedo textures (distinct colors per material), the last material
    alpha-tested with a cutout checker (foliage stand-in).

    Returns (materials dict, texture_mips list, material_index [D] i32,
    post_pass [D] i32 — 1/num_materials of draws in the alpha class)."""
    rng = np.random.default_rng(seed)
    texture_mips = []
    for t in range(num_materials):
        base = np.zeros((tex_size, tex_size, 4), np.uint8)
        yy, xx = np.mgrid[0:tex_size, 0:tex_size]
        checker = ((xx // 16 + yy // 16) % 2).astype(bool)
        c0 = rng.integers(60, 255, 3)
        c1 = rng.integers(60, 255, 3)
        base[..., :3] = np.where(checker[..., None], c0, c1).astype(np.uint8)
        base[..., 3] = 255
        if t == num_materials - 1:
            base[..., 3] = np.where(checker, 255, 0).astype(np.uint8)
        mips = [base]
        while mips[-1].shape[0] > 1:
            mips.append(mips[-1][::2, ::2])
        texture_mips.append(mips)
    materials = dict(
        diffuse=np.ones((num_materials, 4), np.float32),
        specular=np.tile(np.array([[1.0, 1.0, 1.0, 0.3]], np.float32), (num_materials, 1)),
        emissive=np.zeros((num_materials, 3), np.float32),
        textures=np.concatenate(
            [np.arange(num_materials, dtype=np.int32)[:, None],
             np.full((num_materials, 3), -1, np.int32)], axis=1,
        ),
    )
    material_index = (np.arange(draw_count) % num_materials).astype(np.int32)
    post_pass = (material_index == num_materials - 1).astype(np.int32)
    return materials, texture_mips, material_index, post_pass
