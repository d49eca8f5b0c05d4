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
