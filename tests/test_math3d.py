import numpy as np
import pytest

from niagara_tpu.utils import math3d


def test_quat_rotate_matches_matrix(rng):
    for _ in range(50):
        axis = math3d.normalize(rng.normal(size=3).astype(np.float32))
        angle = rng.uniform(-np.pi, np.pi)
        q = math3d.quat_axis_angle(axis, angle)
        m = math3d.quat_to_mat3(q)
        v = rng.normal(size=3).astype(np.float32)
        np.testing.assert_allclose(math3d.rotate_quat(v, q), m @ v, rtol=1e-5, atol=1e-5)


def test_quat_mul_compose(rng):
    a = math3d.quat_axis_angle(np.array([0, 0, 1]), 0.7)
    b = math3d.quat_axis_angle(np.array([1, 0, 0]), -0.3)
    v = rng.normal(size=3).astype(np.float32)
    lhs = math3d.rotate_quat(math3d.rotate_quat(v, b), a)
    rhs = math3d.rotate_quat(v, math3d.quat_mul(a, b))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5, atol=1e-5)


def test_projection_reverse_z_infinite():
    P = math3d.perspective_projection(np.radians(70.0), 16 / 9, 0.1)
    # point at the near plane -> ndc depth 1
    clip = P @ np.array([0, 0, 0.1, 1], dtype=np.float32)
    assert clip[2] / clip[3] == pytest.approx(1.0)
    # far away -> depth ~ 0
    clip = P @ np.array([0, 0, 1e6, 1], dtype=np.float32)
    assert clip[2] / clip[3] == pytest.approx(0.0, abs=1e-6)


def test_view_matrix_identity_camera_looks_down_minus_z_world():
    # identity orientation camera at origin: view flips z so that camera-space
    # z is positive in front (the reference's convention, niagara.cpp:1487-1491)
    V = math3d.view_matrix(np.zeros(3), math3d.quat_identity())
    p = V @ np.array([0, 0, -5, 1], dtype=np.float32)
    assert p[2] == pytest.approx(5.0)


def test_frustum_planes_symmetric():
    P = math3d.perspective_projection(np.radians(70.0), 16 / 9, 0.1)
    fr = math3d.frustum_from_projection(P)
    # a point on the +x frustum boundary at z=1: x = z*tan(fovX/2)
    f = P[1, 1]
    tan_half_x = 1.0 / P[0, 0]
    x_edge = tan_half_x
    # inside test: z*fr[1] - |x|*fr[0] > 0 for inside points
    assert 1.0 * fr[1] - abs(x_edge * 0.99) * fr[0] > 0
    assert 1.0 * fr[1] - abs(x_edge * 1.01) * fr[0] < 0
    assert f > 0


def test_previous_pow2():
    assert math3d.previous_pow2(1920) == 1024
    assert math3d.previous_pow2(1080) == 1024
    assert math3d.previous_pow2(1024) == 512
    assert math3d.previous_pow2(1025) == 1024
    assert math3d.previous_pow2(2) == 1


def test_quantize_half_roundtrip(rng):
    v = rng.normal(size=1000).astype(np.float32)
    bits = math3d.quantize_half(v)
    back = math3d.dequantize_half(bits)
    np.testing.assert_allclose(back, v, rtol=1e-3, atol=1e-4)


def test_quantize_snorm():
    assert math3d.quantize_snorm(np.float32(1.0), 8) == 127
    assert math3d.quantize_snorm(np.float32(-1.0), 8) == -127
    assert math3d.quantize_snorm(np.float32(0.0), 8) == 0
    assert math3d.quantize_snorm(np.float32(2.0), 10) == 511  # clamped
    # round half away from zero
    assert math3d.quantize_snorm(np.float32(0.5 / 127 + 1e-6), 8) == 1


def test_oct_encode_decode_roundtrip(rng):
    v = math3d.normalize(rng.normal(size=(200, 3)).astype(np.float32))
    e = math3d.oct_encode(v)
    assert np.all(np.abs(e) <= 1.0 + 1e-6)
    back = math3d.oct_decode(e)
    np.testing.assert_allclose(back, v, rtol=1e-5, atol=1e-5)


def test_pack_normal_roundtrip(rng):
    n = math3d.normalize(rng.normal(size=(100, 3)).astype(np.float32))
    packed = math3d.pack_normal(n)
    back = math3d.unpack_normal(packed)
    np.testing.assert_allclose(back, n, atol=2.5 / 511)
