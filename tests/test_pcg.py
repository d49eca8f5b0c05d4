import numpy as np

from niagara_tpu.utils.pcg import Pcg32, pcg32_sequence


def test_vectorized_matches_scalar():
    n = 1000
    seq = pcg32_sequence(n, state=0x42)
    rng = Pcg32(state=0x42)
    scalar = np.array([rng.next32() for _ in range(n)], dtype=np.uint32)
    np.testing.assert_array_equal(seq, scalar)


def test_default_stream_known_values():
    # Reference implementation of PCG32 (O'Neill): first outputs from the
    # canonical initializer state are deterministic; cross-check scalar vs
    # vectorized from the default PCG32_INITIALIZER state.
    seq = pcg32_sequence(10)
    rng = Pcg32()
    scalar = np.array([rng.next32() for _ in range(10)], dtype=np.uint32)
    np.testing.assert_array_equal(seq, scalar)


def test_synth_draws_deterministic():
    from niagara_tpu.cooker.synth import synthesize_draws

    d1 = synthesize_draws(3, draw_count=100)
    d2 = synthesize_draws(3, draw_count=100)
    np.testing.assert_array_equal(d1.position, d2.position)
    np.testing.assert_array_equal(d1.orientation, d2.orientation)
    # positions within the 300-unit cube, scale in [2,4)
    assert np.all(np.abs(d1.position) <= 300.0)
    assert np.all(d1.scale >= 2.0) and np.all(d1.scale < 4.0)
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(d1.orientation, axis=1), 1.0, atol=1e-5)
    assert d1.mesh_index.max() < 3


def test_synth_matches_scalar_reference_loop():
    """Emulate the reference's per-draw RNG consumption order scalar-wise
    (niagara.cpp:978-997) and compare against the vectorized synthesis."""
    from niagara_tpu.cooker.synth import synthesize_draws

    mesh_count = 5
    n = 50
    d = synthesize_draws(mesh_count, draw_count=n)

    rng = Pcg32(state=0x42)
    for i in range(n):
        mesh_index = rng.next32() % mesh_count
        px = np.float32(rng.rand01()) * np.float32(600) - np.float32(300)
        py = np.float32(rng.rand01()) * np.float32(600) - np.float32(300)
        pz = np.float32(rng.rand01()) * np.float32(600) - np.float32(300)
        scale = (np.float32(rng.rand01()) + np.float32(1)) * np.float32(2)
        ax = np.float32(rng.rand01()) * np.float32(2) - np.float32(1)
        ay = np.float32(rng.rand01()) * np.float32(2) - np.float32(1)
        az = np.float32(rng.rand01()) * np.float32(2) - np.float32(1)
        angle = np.radians(np.float32(rng.rand01()) * np.float32(90)).astype(np.float32)

        assert d.mesh_index[i] == mesh_index
        np.testing.assert_allclose(d.position[i], [px, py, pz], rtol=1e-6)
        np.testing.assert_allclose(d.scale[i], scale, rtol=1e-6)
        axis = np.array([ax, ay, az], dtype=np.float32)
        axis /= np.float32(np.sqrt(np.sum(axis * axis, dtype=np.float32)))
        q = np.concatenate([axis * np.sin(angle / 2, dtype=np.float32), [np.cos(angle / 2, dtype=np.float32)]])
        np.testing.assert_allclose(d.orientation[i], q, rtol=1e-5, atol=1e-6)
