"""Large-N single-chip benchmark (N=40000 by default).

The headline driver (bench.py) covers N=10000/20000; this script runs
the largest system that fits one chip's HBM as a df64 pair
(N=40000 -> 12.8 GB + vectors on a 16 GB v5e) and reports ir and df64
time-to-1e-9 with TRUE-residual validation.

Reference anchors (BASELINE.md): 4x A100 NCCL 8.782 s (incl ~7.8 s NCCL
init), 8x A100 MPI 0.651 s (= 5.2 chip-seconds).

The SPD system is cached under io/bench/ (generation costs ~25 min of
host time at N=40000 on a 1-core host; the np.load alone is ~7 min from
this disk — budget accordingly).

    python scripts/bench_large.py [N]

Measured 2026-08-16 (v5e-1): ir 1.811 s (365 inner iters, true 1.0e-9),
df64 9.32 s (359 iters, true 9.9e-10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    import lam_tpu  # noqa: F401
    from lam_tpu import DenseOperator, cg_solve, cg_solve_ir
    from lam_tpu import generate as gen

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    seed, tol = 2024, 1e-9
    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, "..", "io", "bench",
                         f"lam_bench_spd_N{n}_s{seed}.npy")

    t0 = time.perf_counter()
    if os.path.exists(cache):
        a = np.load(cache)
    else:
        print(f"generating N={n} SPD system (slow; will cache) ...",
              flush=True)
        a = gen.random_spd_matrix_fast(n, seed=seed)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        with open(tmp, "wb") as fh:
            np.save(fh, a)
        os.replace(tmp, cache)
    b = gen.random_rhs(n, seed=seed + 10)
    bnorm = np.linalg.norm(b)
    print(f"system ready in {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    op = DenseOperator.from_dense(a, precision="df64")
    op32 = op.as_f32()
    jax.block_until_ready(op.operand)
    print(f"operator build+transfer {time.perf_counter() - t0:.0f}s "
          f"(engine={op.engine})", flush=True)

    def true_rel(x):
        return float(np.linalg.norm(b - a @ np.asarray(x, np.float64))
                     / bnorm)

    _ = cg_solve_ir(op32, op, b, max_iters=30, rel_error=1e-2)  # compile
    best, res = 1e9, None
    for _ in range(2):
        t0 = time.perf_counter()
        r = cg_solve_ir(op32, op, b, max_iters=10000, rel_error=tol)
        float(r.rel_residual)
        dt = time.perf_counter() - t0
        if dt < best:
            best, res = dt, r
    print(f"N={n} ir:   {best:.3f} s  iters={int(res.num_iters)}  "
          f"true={true_rel(res.x):.2e}  conv={bool(res.converged)}",
          flush=True)

    r0 = cg_solve(op, b, max_iters=0, rel_error=tol)
    float(r0.rel_residual)
    t0 = time.perf_counter()
    r = cg_solve(op, b, max_iters=10000, rel_error=tol)
    float(r.rel_residual)
    print(f"N={n} df64: {time.perf_counter() - t0:.3f} s  "
          f"iters={int(r.num_iters)}  true={true_rel(r.x):.2e}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
