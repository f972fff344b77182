"""Problem generators: parity with the reference's two generators."""

import numpy as np

from lam_tpu import generate as gen


def test_tridiagonal_matches_reference_pattern():
    # (i,j): 2 if i==j, 1 if |i-j|==1, 0 else
    # (ConjugateGradient_CPU_MPI_OMP.hpp:237-247)
    a = gen.tridiagonal_matrix(6)
    expect = 2 * np.eye(6) + np.eye(6, k=1) + np.eye(6, k=-1)
    np.testing.assert_array_equal(a, expect)


def test_tridiagonal_row_blocks_tile_the_matrix():
    n = 10
    full = gen.tridiagonal_matrix(n)
    stitched = np.vstack([
        gen.tridiagonal_rows(0, 3, n),
        gen.tridiagonal_rows(3, 4, n),
        gen.tridiagonal_rows(7, 3, n),
    ])
    np.testing.assert_array_equal(stitched, full)


def test_ones_rhs():
    np.testing.assert_array_equal(gen.ones_rhs(5), np.ones(5))


def test_tridiagonal_numpy_fallback_is_vectorized_and_correct():
    # dtype != f64 bypasses the native builder, exercising the numpy
    # path; must match the reference pattern including the block edges
    full = gen.tridiagonal_matrix(9)
    blk = gen.tridiagonal_rows(2, 5, 9, dtype=np.float32)
    np.testing.assert_array_equal(blk, full[2:7].astype(np.float32))
    # first/last rows (no sub-/super-diagonal wraparound)
    first = gen.tridiagonal_rows(0, 1, 4, dtype=np.float32)
    np.testing.assert_array_equal(first, [[2, 1, 0, 0]])
    last = gen.tridiagonal_rows(3, 1, 4, dtype=np.float32)
    np.testing.assert_array_equal(last, [[0, 0, 1, 2]])


def test_random_spd_is_spd_with_reference_spectrum():
    n = 64
    a = gen.random_spd_matrix(n, seed=3)
    np.testing.assert_allclose(a, a.T, atol=1e-12)
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0
    # Eigenvalue law exp(3.5*U(-1,1)) (random_spd_system.cpp:83-87)
    assert w.min() >= np.exp(-3.5) * 0.9
    assert w.max() <= np.exp(3.5) * 1.1


def test_fast_spd_has_exact_requested_spectrum():
    n = 128
    a = gen.random_spd_matrix_fast(n, seed=4)
    rng = np.random.default_rng(4)
    d = np.sort(gen.random_eigenvalues(n, rng))
    w = np.sort(np.linalg.eigvalsh(a))
    # Householder similarity preserves the spectrum exactly (to rounding).
    np.testing.assert_allclose(w, d, rtol=1e-10)


def test_random_system_shapes():
    a, b = gen.random_spd_system(32, seed=5)
    assert a.shape == (32, 32) and b.shape == (32,)
    assert np.all(np.abs(b) <= 1.0)


def test_tridiagonal_hi_plane_is_exact_padded():
    hi = gen.tridiagonal_hi_plane(6, 8)
    assert hi.dtype == np.float32 and hi.shape == (8, 8)
    np.testing.assert_array_equal(hi[:6, :6],
                                  gen.tridiagonal_matrix(6))
    assert np.all(hi[6:] == 0) and np.all(hi[:, 6:] == 0)
    # entries are exact in f32: the lo plane is identically zero
    a64 = gen.tridiagonal_matrix(6)
    assert np.all(a64 - hi[:6, :6].astype(np.float64) == 0)


def test_tridiagonal_hi_plane_device_matches_host():
    # the device-side (jit iota) builder must agree elementwise with the
    # host builder for both exact and padded shapes
    for n, n_p in ((6, 8), (16, 16), (5, 16)):
        dev = np.asarray(gen.tridiagonal_hi_plane_device(n, n_p))
        host = gen.tridiagonal_hi_plane(n, n_p)
        np.testing.assert_array_equal(dev, host)
