"""df64 deferred-renormalization experiment (VERDICT r3 item 8).

The df64 parity engine folds every 128-lane slab of exact Dekker
products into the lane accumulators with a Knuth two_sum (6 VPU flops
per element). Two cheaper schemes were tried on hardware and REJECTED
with identical signatures (converged by recurrence, TRUE residual
~2e-7): FMA-contraction of the product error, and a Kahan/fast_two_sum
fold (docs/REPORT.md negative-results ledger). This script runs the
third and last candidate: slab-amortized renormalization ('defer' in
ops/gemv.py) — exact products, PLAIN group adds within a tile, ONE
two_sum per tile.

Error-bound argument under test: each plain add loses <= 2^-24 relative
to the GROUP partial (k-1 = tb/128 - 1 adds per tile); across a row's
nblk tiles the group partials join compensated, so the uncompensated
loss is ~(k-1)*2^-24*|group|_rms*sqrt(nblk) — at N=20000, tb=512:
3*6e-8*|row|/sqrt(39)*sqrt(39) ~ 1.8e-7 relative worst-case, ~1e-8
random-sign. If the full-solve TRUE residual stays <= 2e-9 the scheme
is adoptable; if it degrades to the 1e-7 class it joins the ledger as
the third, closing negative result.

Measures a full N=20000 df64 solve (reference anchor: 1x A100 0.866 s,
TESTS/BEST_RESULTS:366; round-3 nolow measurement: 1.849 s) per comp
budget in a SUBPROCESS (the budget is chosen at import via
LAM_TPU_DF64_COMP). Writes results/DF64_DEFER_r04.log.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N = 20000
SEED = 2024
TOL = 1e-9


def run_one(comp):
    import jax

    import lam_tpu  # noqa: F401
    from lam_tpu import DenseOperator, cg_solve

    assert jax.default_backend() == "tpu", jax.default_backend()
    path = os.path.join(HERE, "io", "bench",
                        f"lam_bench_spd_N{N}_s{SEED}.npy")
    a = np.load(path)
    from lam_tpu import generate as gen
    b = gen.random_rhs(N, seed=SEED + 10)
    bn = np.linalg.norm(b)

    op = DenseOperator.from_dense(a, precision="df64")
    jax.block_until_ready(op.operand)

    r0 = cg_solve(op, b, max_iters=0, rel_error=TOL)
    float(r0.rel_residual)  # compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        res = cg_solve(op, b, max_iters=10000, rel_error=TOL)
        float(res.rel_residual)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, res)
    dt, res = best
    x = np.asarray(res.x, np.float64)[:N]
    true_rel = float(np.linalg.norm(b - a @ x) / bn)
    print(json.dumps({
        "comp": comp, "s": round(dt, 4),
        "iters": int(res.num_iters),
        "converged": bool(res.converged),
        "rec_rel": float(res.rel_residual),
        "true_rel": true_rel,
    }), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--comp":
        run_one(sys.argv[2])
        return

    rows = []
    for comp in ("nolow", "defer"):
        env = os.environ.copy()
        env["LAM_TPU_DF64_COMP"] = comp
        # 'defer' is hardware-REJECTED and gated out of the public comp
        # modes (ops/gemv.py _resolve_comp); this measurement script is
        # the one consumer of the private re-enable hook
        env["LAM_TPU_DF64_ALLOW_REJECTED_COMPS"] = "1"
        print(f"running comp={comp} ...", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--comp", comp],
            env=env, capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if out.returncode != 0 or not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"comp={comp} run failed")
        rows.append(json.loads(line[-1]))
        print(" ", line[-1], flush=True)

    nolow, defer = rows
    speedup = nolow["s"] / defer["s"]
    ok = defer["true_rel"] <= 2e-9
    verdict = (
        "ADOPTABLE: true residual holds at the 1e-9 target"
        if ok else
        "REJECTED: true residual degrades (the third cheap-fold "
        "scheme to fail; Knuth two_sum per slab is load-bearing)")
    out_path = os.path.join(HERE, "results", "DF64_DEFER_r04.log")
    with open(out_path, "w") as fh:
        fh.write("# df64 deferred-renormalization experiment "
                 "(scripts/df64_defer.py), round 4\n")
        fh.write(f"# N={N} full solve, tol {TOL}, best-of-3, real "
                 "v5e; anchor 1x A100 0.866 s "
                 "(TESTS/BEST_RESULTS:366)\n")
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write(f"# defer vs nolow: {speedup:.3f}x wall-clock; "
                 f"true residual {defer['true_rel']:.3e} vs "
                 f"{nolow['true_rel']:.3e}\n")
        fh.write(f"# verdict: {verdict}\n")
    print(f"defer vs nolow: {speedup:.3f}x; {verdict}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
