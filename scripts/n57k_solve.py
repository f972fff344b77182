"""Round-3 headline: the largest single-chip solve — N=57344.

Packed-triangle df64 pair = N*(N+tb)*4 B = 13.3 GB -> fits ONE v5e
(16 GB HBM); the round-2 full-square layout capped real measurements at
N=40000 (VERDICT.md item 1/2). System: reference construction
(eigenvalues exp(3.5*U(-1,1)), Householder similarity, random rhs),
cached by scripts/gen_big_spd.py. Solves: ir (f32 packed-triangle inner
+ df64 refinement) and df64 parity engine, both with HOST-validated
true residuals against the full f64 matrix.

Appends CSV rows (reference contract) to results/MERGE_TPU_IR.txt /
MERGE_TPU_DF64.txt and logs to stdout (tee into results/N57K_r03.log).
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N = 57344
SEED = 2024
TOL = 1e-9


def main():
    import jax

    import lam_tpu  # noqa: F401
    from lam_tpu import DenseOperator, cg_solve, cg_solve_ir

    assert jax.default_backend() == "tpu", jax.default_backend()
    path = os.path.join(HERE, "io", "bench",
                        f"lam_bench_spd_N{N}_s{SEED}.npy")
    t0 = time.time()
    a = np.load(path)
    print(f"loaded {path} in {time.time()-t0:.0f}s", flush=True)
    from lam_tpu import generate as gen
    b = gen.random_rhs(N, seed=SEED + 10)
    bn = np.linalg.norm(b)

    t0 = time.time()
    op = DenseOperator.from_dense(a, precision="df64")
    assert op.engine == "pallas_symm_packed", op.engine
    jax.block_until_ready(op.operand)
    load_s = time.time() - t0
    hi, lo = op.operand
    gb = (hi.size + lo.size) * 4 / 1024**3
    print(f"operator built+resident in {load_s:.0f}s; packed pair "
          f"{gb:.2f} GB on device", flush=True)

    def timed(fn, label, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            float(r.rel_residual)  # scalar readback forces execution
            dt = time.perf_counter() - t0
            if best is None or dt < best[0]:
                best = (dt, r)
        dt, r = best
        x = np.asarray(r.x, np.float64)
        true = float(np.linalg.norm(b - a @ x) / bn)
        print(f"{label}: {dt:.3f}s iters={int(r.num_iters)} "
              f"conv={bool(r.converged)} rec={float(r.rel_residual):.3e} "
              f"TRUE={true:.3e}", flush=True)
        return dt, r, true

    op32 = op.as_f32()
    _ = cg_solve_ir(op32, op, b, max_iters=30, rel_error=1e-2)  # compile
    ir_s, ir_r, ir_true = timed(
        lambda: cg_solve_ir(op32, op, b, max_iters=10000, rel_error=TOL),
        "ir+packed-symm")

    r0 = cg_solve(op, b, max_iters=0, rel_error=TOL)
    float(r0.rel_residual)
    df_s, df_r, df_true = timed(
        lambda: cg_solve(op, b, max_iters=10000, rel_error=TOL),
        "df64+packed-symm", reps=1)

    def row(dt, r):
        it = max(int(r.num_iters), 1)
        return (f"{N},1,1,{load_s:g},{dt/it:g},{dt/it:g},"
                f"{int(r.num_iters)},{float(r.rel_residual):g},{dt:g}")

    with open(os.path.join(HERE, "results", "MERGE_TPU_IR.txt"),
              "a") as f:
        f.write(row(ir_s, ir_r) + "\n")
    with open(os.path.join(HERE, "results", "MERGE_TPU_DF64.txt"),
              "a") as f:
        f.write(row(df_s, df_r) + "\n")
    print("rows appended", flush=True)
    assert ir_true < 2e-9, "ir true residual validation failed"
    return 0


if __name__ == "__main__":
    sys.exit(main())
