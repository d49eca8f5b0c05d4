"""Camera state and per-frame culling constants.

Reference: camera defaults niagara.cpp:834-837, per-frame CullData setup
niagara.cpp:1487-1522.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops.cull import CullParams
from ..utils import math3d


@dataclass
class Camera:
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, dtype=np.float32))
    orientation: np.ndarray = field(default_factory=math3d.quat_identity)
    fov_y: float = float(np.radians(70.0))
    znear: float = 0.1


def save_camera(path: str, camera: Camera) -> None:
    """Persist the camera (role of the reference's `P` key + .camera file,
    niagara.cpp:389-395, scenecache.cpp:372-413)."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "version": 1,
                "position": [float(v) for v in camera.position],
                "orientation": [float(v) for v in camera.orientation],
                "fov_y": float(camera.fov_y),
                "znear": float(camera.znear),
            },
            f,
        )


def load_camera(path: str) -> Camera:
    import json

    with open(path) as f:
        data = json.load(f)
    if data.get("version") != 1:
        raise ValueError(f"unsupported camera file version in {path}")
    return Camera(
        position=np.array(data["position"], dtype=np.float32),
        orientation=np.array(data["orientation"], dtype=np.float32),
        fov_y=float(data["fov_y"]),
        znear=float(data["znear"]),
    )


@dataclass
class RenderSettings:
    """Runtime toggles (reference key bindings, niagara.cpp:332-409)."""

    culling: bool = True
    lod: bool = True
    occlusion: bool = True
    cluster_occlusion: bool = True
    cluster_backface: bool = True
    draw_distance: float = 200.0
    debug_lod_step: int = 0


def make_cull_params(
    camera: Camera,
    width: int,
    height: int,
    pyramid_w: int,
    pyramid_h: int,
    settings: RenderSettings,
    post_pass: int = 0,
):
    """Build (CullParams, projection[4,4]) for one frame."""
    view = math3d.view_matrix(camera.position, camera.orientation)
    projection = math3d.perspective_projection(camera.fov_y, width / height, camera.znear)
    frustum = math3d.frustum_from_projection(projection)

    # 1px error target at the given resolution (niagara.cpp:1514)
    lod_target = (2.0 / projection[1, 1]) * (1.0 / height) * (1 << settings.debug_lod_step)

    params = CullParams(
        view=view,
        p00=np.float32(projection[0, 0]),
        p11=np.float32(projection[1, 1]),
        znear=np.float32(camera.znear),
        zfar=np.float32(settings.draw_distance),
        frustum=frustum,
        lod_target=np.float32(lod_target),
        pyramid_w=np.float32(pyramid_w),
        pyramid_h=np.float32(pyramid_h),
        culling_enabled=np.int32(settings.culling),
        lod_enabled=np.int32(settings.lod),
        occlusion_enabled=np.int32(settings.occlusion),
        cluster_occlusion_enabled=np.int32(settings.occlusion and settings.cluster_occlusion),
        cluster_backface_enabled=np.int32(settings.cluster_backface),
        post_pass=np.int32(post_pass),
    )
    return params, projection
