"""Headline benchmark: time-to-1e-9 dense CG at N=20000 on one chip.

Reference anchor (BASELINE.md): single A100-40GB solves the N=20000
random SPD system to 1e-9 in 0.866 s (343 iters, TESTS/BEST_RESULTS:366).
This benchmark builds an equivalent system (identical eigenvalue law
exp(3.5*U(-1,1)), random orthogonal similarity -> same CG behavior),
solves it on one TPU chip with both the df64 (f64-parity) and the
mixed-precision (f32 + iterative refinement) engines, validates the TRUE
residual in float-float arithmetic, and reports the better time.

Prints exactly one JSON line:
  {"metric": ..., "value": s, "unit": "s", "vs_baseline": speedup}
vs_baseline > 1 means faster than the reference A100.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_S = 0.866  # 1x A100, N=20000, tol 1e-9 (TESTS/BEST_RESULTS:366)
N = 20000
TOL = 1e-9
SEED = 2024


def main():
    import jax

    import lam_tpu  # noqa: F401  (x64 on)
    from lam_tpu import DenseOperator, cg_solve, cg_solve_ir
    from lam_tpu import generate as gen

    t0 = time.perf_counter()
    cache = f"/tmp/lam_bench_spd_N{N}_s{SEED}.npy"
    if os.path.exists(cache):
        a = np.load(cache, mmap_mode=None)
    else:
        a = gen.random_spd_matrix_fast(N, seed=SEED)
        try:
            np.save(cache, a)
        except OSError:
            pass
    b = gen.random_rhs(N, seed=SEED + 10)
    gen_s = time.perf_counter() - t0

    op = DenseOperator.from_dense(a, precision="df64")
    op32 = op.as_f32()
    jax.block_until_ready(op.operand)
    bnorm = np.linalg.norm(b)

    def true_residual(x):
        # host-side f64 ground truth, independent of any device kernel
        r = b - a @ np.asarray(x, dtype=np.float64)
        return float(np.linalg.norm(r) / bnorm)

    results = {}

    # Each engine: warm up (compile + buffer placement), then time the
    # solve twice and keep the faster run — the remote-tunnel TPU shows
    # sporadic multi-x slowdowns, and min-of-2 rejects those outliers.
    # Timing uses a scalar readback, not block_until_ready (which can be
    # a no-op through the tunnel and under-report).
    def timed(fn):
        best, best_res = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            r = fn()
            float(r.rel_residual)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, best_res = dt, r
        return best, best_res

    # mixed-precision engine (the headline path)
    _ = cg_solve_ir(op32, op, b, max_iters=30, rel_error=1e-2)  # compile
    ir_s, res_ir = timed(lambda: cg_solve_ir(op32, op, b, max_iters=10000,
                                             rel_error=TOL))
    results["ir"] = {
        "s": ir_s,
        "iters": int(res_ir.num_iters),
        "true_rel": true_residual(res_ir.x),
        "converged": bool(res_ir.converged),
    }

    # df64 parity engine: full f64-quality recurrence on device
    r0 = cg_solve(op, b, max_iters=0, rel_error=TOL)  # compile
    float(r0.rel_residual)
    df64_s, res = timed(lambda: cg_solve(op, b, max_iters=10000,
                                         rel_error=TOL))
    results["df64"] = {
        "s": df64_s,
        "iters": int(res.num_iters),
        "true_rel": true_residual(res.x),
        "converged": bool(res.converged),
    }

    valid = {k: v for k, v in results.items()
             if v["converged"] and v["true_rel"] <= 2e-9}
    if not valid:
        print(json.dumps({"metric": f"time_to_1e-9_N{N}_1chip",
                          "value": None, "unit": "s", "vs_baseline": 0.0,
                          "error": "no engine reached a validated 1e-9 "
                                   "true residual",
                          "detail": results}))
        return 1

    best = min(valid, key=lambda k: valid[k]["s"])
    value = valid[best]["s"]
    out = {
        "metric": f"time_to_1e-9_N{N}_1chip",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 3),
        "engine": best,
        "iters": valid[best]["iters"],
        "true_rel_residual": valid[best]["true_rel"],
        "gen_s": round(gen_s, 2),
        "all": {k: {"s": round(v["s"], 4), "iters": v["iters"],
                    "true_rel": v["true_rel"]} for k, v in results.items()},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
