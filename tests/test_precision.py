"""Error-free transforms: the foundation of the df64 kernels."""

import numpy as np
import jax.numpy as jnp

from lam_tpu.precision import (
    join_f64,
    split_f64,
    two_prod,
    two_sum,
)


def test_split_join_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1e6, 1e6, size=1000))
    hi, lo = split_f64(x)
    assert hi.dtype == jnp.float32 and lo.dtype == jnp.float32
    back = join_f64(hi, lo)
    # hi carries 24 bits, lo the next 24: round-trip error ~2^-48 relative.
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=2 ** -47)


def test_two_sum_exact():
    rng = np.random.default_rng(1)
    a32 = jnp.asarray(rng.uniform(-1, 1, 1000), dtype=jnp.float32)
    b32 = jnp.asarray(rng.uniform(-1e-6, 1e-6, 1000), dtype=jnp.float32)
    s, e = two_sum(a32, b32)
    exact = a32.astype(jnp.float64) + b32.astype(jnp.float64)
    recon = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(exact))


def test_two_prod_exact():
    rng = np.random.default_rng(2)
    a32 = jnp.asarray(rng.uniform(-1, 1, 1000), dtype=jnp.float32)
    b32 = jnp.asarray(rng.uniform(-1, 1, 1000), dtype=jnp.float32)
    p, e = two_prod(a32, b32)
    exact = a32.astype(jnp.float64) * b32.astype(jnp.float64)
    recon = p.astype(jnp.float64) + e.astype(jnp.float64)
    # two_prod is exact: p + e == a*b in f64 (product of two f32 fits f64).
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(exact))
