"""df64 compensation-budget measurement on the real TPU.

Round-2 perf investigation (VERDICT round-1 item 2: close the df64
parity-engine gap vs the 1xA100 anchor, 0.866 s at N=20000):

  1. matvec-chain time for comp = full / nolow, bracketed
     (full first AND last — the tunnel's bandwidth drifts ~520-730 GB/s
     across minutes, so only within-run comparisons are meaningful);
  2. achieved in-kernel VPU ops/s + HBM speed-of-light — the roofline
     evidence (docs/REPORT.md §df64);
  3. full df64 solves per comp with HOST-side f64 true residuals — the
     accuracy evidence for whichever budget wins.

Round-2 verdicts from the 2026-08-16 run (results/DF64_TUNE_r02.log):
'nolow' adopted as default (2.297 s vs 2.482 s at N=20000, identical
9.79e-10 true residual); 'fast' (Kahan fold) REJECTED — true residual
silently degraded to 2.2e-7.

Usage: python scripts/df64_tune.py [N]   (default 20000; needs the
io/bench/lam_bench_spd_N{N}_s2024.npy cache)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import lam_tpu  # noqa: F401  (x64 on)

from lam_tpu import generate as gen
from lam_tpu.ops import gemv
from lam_tpu.precision import join_f64, split_f64
from lam_tpu.solver.operators import (
    DenseOperator,
    _wrap_matvec,
    padded_size,
    split_f64_host,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
REPS = 20
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_system():
    path = os.path.join(HERE, "io", "bench",
                        f"lam_bench_spd_N{N}_s2024.npy")
    a = np.load(path)
    b = gen.random_rhs(N, seed=2034)
    return a, b


@functools.partial(jax.jit, static_argnames=("comp", "reps"))
def df64_chain(hi, lo, ph, plo, comp, reps):
    def body(_, v):
        vh, vl = v
        yh, yl = gemv.gemv_df64(hi, lo, vh, vl, comp=comp)
        nrm = jnp.sqrt(jnp.vdot(yh, yh)).astype(jnp.float32)
        return (yh / nrm, yl / nrm)

    return jax.lax.fori_loop(0, reps, body, (ph, plo))


@functools.partial(jax.jit, static_argnames=("reps",))
def f32_chain(hi, p, reps):
    def body(_, v):
        w = gemv.gemv_f32(hi, v)
        return w / jnp.sqrt(jnp.vdot(w, w))

    return jax.lax.fori_loop(0, reps, body, p)


def timed(fn, label, out):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn()
    jax.block_until_ready(r)
    float(jnp.vdot(jax.tree_util.tree_leaves(r)[0].ravel()[:1],
                   jnp.ones(1, jnp.float32)))  # forced readback
    dt = (time.perf_counter() - t0) / REPS
    out[label] = dt
    print(f"  {label:18s} {dt * 1e3:8.3f} ms/matvec", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    a, b = load_system()
    npad = padded_size(N)
    a_p = np.zeros((npad, npad), np.float64)
    a_p[:N, :N] = a
    hi_np, lo_np = split_f64_host(a_p)
    hi = jnp.asarray(hi_np)
    lo = jnp.asarray(lo_np)
    del a_p, hi_np, lo_np
    b_p = np.zeros(npad)
    b_p[:N] = b
    p64 = jnp.asarray(b_p)
    ph, plo = split_f64(p64)
    ph = ph / jnp.float32(np.linalg.norm(b))
    plo = plo / jnp.float32(np.linalg.norm(b))

    gbytes = 2 * npad * npad * 4 / 1e9

    print(f"\n== matvec chains (N={N}, padded {npad}, {REPS} reps, "
          f"{gbytes:.2f} GB/matvec) ==", flush=True)
    # ('fast' — Kahan fold — was measured 2026-08-16 and REJECTED: solve
    # true residual 2.2e-7; it is no longer an accepted budget.)
    t = {}
    timed(lambda: df64_chain(hi, lo, ph, plo, "full", REPS), "full", t)
    timed(lambda: df64_chain(hi, lo, ph, plo, "nolow", REPS), "nolow", t)
    timed(lambda: df64_chain(hi, lo, ph, plo, "full", REPS), "full2", t)
    timed(lambda: f32_chain(hi, ph, REPS), "f32_full_matrix", t)
    for k, v in t.items():
        print(f"  {k:18s} {gbytes / v:7.1f} GB/s effective")

    # Achieved VPU throughput inside the compensated kernel (lower
    # bound on the VPU ceiling): the full->nolow delta scales with the
    # static op count (27 -> 25 ops/element), which is the evidence the
    # kernel is partially VPU-bound rather than purely HBM-bound.
    print("\n== achieved in-kernel f32 VPU ops/s ==")
    for label, ops in (("full2", 27), ("nolow", 25)):
        rate = ops * npad * npad / t[label]
        print(f"  {label:6s} @ {ops} ops/elem: {rate / 1e12:.2f} T ops/s "
              f"({t[label] * 1e3:7.3f} ms/matvec)")
    sol = gbytes / 819.0  # v5e spec HBM
    print(f"  HBM speed-of-light @ 819 GB/s spec: {sol * 1e3:.2f} "
          f"ms/matvec -> {sol * 359:.2f} s for a 359-iteration solve")

    print("\n== full df64 solves (tol 1e-9, true residual host-checked) "
          "==", flush=True)
    bnorm = np.linalg.norm(b)

    def mv_comp(comp):
        def mv(operand, p):
            h, l = operand
            vh, vl = split_f64(p)
            yh, yl = gemv.gemv_df64(h, l, vh, vl, comp=comp)
            return join_f64(yh, yl)

        return mv

    from lam_tpu import cg_solve
    for comp in ("full", "nolow"):
        op = DenseOperator(_wrap_matvec(mv_comp(comp)), (hi, lo), N,
                           npad, jnp.float64, "df64", "pallas")
        r = cg_solve(op, b, max_iters=0, rel_error=1e-9)  # compile
        float(r.rel_residual)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = cg_solve(op, b, max_iters=10000, rel_error=1e-9)
            float(r.rel_residual)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        true_rel = float(np.linalg.norm(
            b - a @ np.asarray(r.x, np.float64)) / bnorm)
        print(f"  {comp:6s} solve {best:7.3f} s  iters "
              f"{int(r.num_iters):4d}  true_rel {true_rel:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
