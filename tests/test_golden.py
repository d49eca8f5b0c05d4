"""Golden-frame regression guard (SURVEY.md §4: golden-buffer parity harness).

Locks compact statistics of a fixed scene/camera render so refactors that
silently change culling, rasterization, or shading output fail loudly.
Regenerate with tools/regen_golden.py when an intentional change shifts them.
"""

import numpy as np
import pytest

from niagara_tpu import scene as scene_mod
from niagara_tpu.cooker.synth import synthesize_draws
from niagara_tpu.ops.raster import INVALID_FRAG
from test_frame import CFG, render

# captured 2026-08-17 (CPU backend, tile rasterizer, 8-kitten line scene);
# re-baked after the HW-parity raster change (1/256 subpixel snap +
# top-left fill rule, tests/test_raster_oracle.py) — boundary pixels and
# snapped depths shifted within tolerance of the old bake
GOLDEN = {
    "coverage": 2119,
    "depth_sum": 72.525681,
    "img_mean": 0.653795,
    "unique_frags": 138,
}


@pytest.fixture(scope="module")
def golden_scene(kitten_geometry):
    draws = synthesize_draws(kitten_geometry.meshes.count, draw_count=8)
    draws.position[:] = np.array([[0.0, 0.0, -3.0]]) + np.array([[0.8, 0.0, 0.0]]) * (
        np.arange(8)[:, None] - 3.5
    )
    draws.scale[:] = 1.0
    draws.orientation[:] = np.array([0, 0, 0, 1], dtype=np.float32)
    return scene_mod.upload(kitten_geometry, draws)


def test_golden_frame_statistics(golden_scene):
    image, fb, state, stats = render(golden_scene)
    vis = np.asarray(fb.vis)
    depth = np.asarray(fb.depth)
    img = np.asarray(image)
    cov = vis != INVALID_FRAG

    coverage = int(cov.sum())
    assert abs(coverage - GOLDEN["coverage"]) <= max(2, GOLDEN["coverage"] // 200), coverage
    assert float(depth.sum()) == pytest.approx(GOLDEN["depth_sum"], rel=2e-4)
    assert float(img[cov].mean()) == pytest.approx(GOLDEN["img_mean"], rel=2e-3)
    assert abs(len(np.unique(vis[cov])) - GOLDEN["unique_frags"]) <= 3
