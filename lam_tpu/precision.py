"""Float-float ("df64") arithmetic building blocks.

TPUs have no native float64: XLA emulates it (correct but ~80x below HBM
speed-of-light on this chip), and Pallas/Mosaic kernels cannot use it at
all. The reference library is float64 end-to-end (templates instantiated
<double>, e.g. ConjugateGradient_MultiGPUS_CUDA_MPI.cu:707-708), so the
rebuild represents the HOT data (the dense matrix) as an unevaluated sum
of two float32s ("double-float"): value = hi + lo with hi = fl32(value).
Two f32 planes are exactly the 8 bytes/element of f64 — bandwidth parity
with the reference — while all arithmetic runs on native f32 VPU/MXU ops.

The error-free transforms below (Knuth two_sum, Dekker split/two_prod)
are standard; they require IEEE round-to-nearest f32 adds/muls, which the
TPU VPU provides. They are used both at the JAX level (tests, fallbacks)
and inside Pallas kernels (lam_tpu/ops/gemv.py).

Accuracy of the df64 dense matvec: products are exact (two_prod), and
accumulation is compensated at every add, so the result carries ~2^-48
relative error — indistinguishable from f64 for the 1e-9 convergence
target of the reference (report.pdf §V).
"""

from __future__ import annotations

import jax.numpy as jnp

# Dekker splitter for f32: 2^12 + 1 (f32 has 24 mantissa bits -> split 12/12).
_SPLIT32 = 4097.0


def split_f64(x):
    """Split an f64 array into a (hi, lo) pair of f32 arrays, x == hi + lo."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    """Recombine a (hi, lo) f32 pair into f64."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def two_sum(a, b):
    """Knuth's branch-free exact addition: a + b == s + e exactly."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b):
    """Dekker's exact addition, valid when |a| >= |b|: a + b == s + e."""
    s = a + b
    e = b - (s - a)
    return s, e


def split32(a):
    """Dekker split of an f32 value into high/low 12-bit-mantissa halves."""
    c = jnp.float32(_SPLIT32) * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Exact f32 multiplication: a * b == p + e exactly (Dekker/Veltkamp)."""
    p = a * b
    ah, al = split32(a)
    bh, bl = split32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(x, y):
    """Double-float addition: (xh,xl) + (yh,yl) -> (zh,zl)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def df_mul(x, y):
    """Double-float multiplication: (xh,xl) * (yh,yl) -> (zh,zl)."""
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def df_neg(x):
    return (-x[0], -x[1])
