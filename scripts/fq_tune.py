"""Hardware measurement: irfq (2-byte inner plane) vs ir/irq.

Full time-to-1e-9 solves on the real chip, best-of-3 with scalar
readbacks, TRUE residual validated host-side in f64. Usage:
    python scripts/fq_tune.py [N]
N defaults to 10000 (bench cache); 20480 uses the tune cache.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

import lam_tpu  # noqa: E402,F401
from lam_tpu import DenseOperator, cg_solve_ir  # noqa: E402
from lam_tpu import generate as gen  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
TOL = 1e-9
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_system(n):
    for name in (f"lam_bench_spd_N{n}_s2024.npy",
                 f"lam_tune_spd_N{n}_s2024.npy"):
        p = os.path.join(HERE, "io", "bench", name)
        if os.path.exists(p):
            a = np.load(p, mmap_mode="r")
            break
    else:
        raise SystemExit(f"no cached matrix for N={n}")
    b = gen.random_rhs(n, seed=2034)
    return a, b


def timed_solve(op32, op, b, floor):
    _ = cg_solve_ir(op32, op, b, max_iters=30, rel_error=1e-2,
                    inner_floor=floor)  # compile
    best = None
    res = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = cg_solve_ir(op32, op, b, max_iters=10000, rel_error=TOL,
                        inner_floor=floor)
        float(r.rel_residual)
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best, res = dt, r
    return best, res


def main():
    a, b = load_system(N)
    bnorm = np.linalg.norm(b)

    def true_rel(x):
        return float(np.linalg.norm(b - a @ np.asarray(x, np.float64))
                     / bnorm)

    for prec, floor in (("fq", 1e-2), ("dfq", 1e-5), ("df64", 1e-5)):
        t0 = time.perf_counter()
        if prec == "df64":
            op = DenseOperator.from_dense(np.asarray(a), precision=prec)
        elif prec == "fq":
            op = DenseOperator.from_dense_fq(a, check_symmetric=False)
        else:
            op = DenseOperator.from_dense_dfq(a, check_symmetric=False)
        jax.block_until_ready(op.operand)
        build_s = time.perf_counter() - t0
        s, r = timed_solve(op.as_f32(), op, b, floor)
        label = {"fq": "irfq", "dfq": "irq", "df64": "ir"}[prec]
        print(f"N={N} {label:5s} build {build_s:7.1f} s  solve "
              f"{s:7.4f} s  iters {int(r.num_iters):4d}  "
              f"rec {float(r.rel_residual):.3e}  "
              f"TRUE {true_rel(r.x):.3e}", flush=True)
        del op


if __name__ == "__main__":
    main()
