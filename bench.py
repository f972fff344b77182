"""Headline benchmark: dense-CG time-to-1e-9 on one TPU chip.

BASELINE.json names the metric "time-to-1e-9 residual at N=10k and
N=70k". N=70000 (39 GB fp64) exceeds one chip's HBM and no multi-chip
hardware is reachable here, so the headline is the N=10000 solve against
the reference's single-A100 anchor (0.261 s, 323 iters,
TESTS/BEST_RESULTS:362), with N=20000 (anchor 0.866 s,
TESTS/BEST_RESULTS:366) reported alongside.

Systems use the reference construction (eigenvalues exp(3.5*U(-1,1)),
random orthogonal similarity, random U(-1,1) rhs); every solve's TRUE
residual is validated host-side in f64. Engines: df64 = float-float
Pallas (f64-parity), ir = f32 iterations + df64 iterative refinement,
irfq = refinement on fully-quantized storage (2-byte inner plane —
round 3; needs the native pack + a TPU, skipped otherwise).
Each engine is timed best-of-3 (the remote tunnel shows sporadic
multi-x stalls and ~20% bandwidth drift) with scalar readbacks (block_until_ready can no-op
through the tunnel).

Prints exactly one JSON line:
  {"metric": ..., "value": s, "unit": "s", "vs_baseline": speedup, ...}
vs_baseline > 1 means faster than the reference A100.
"""

import json
import os
import sys
import time

import numpy as np

# Reference anchors (BASELINE.md): N=10000/20000 are 1x A100-40GB fp64;
# N=40000 is the 4x A100 NCCL row (8.782 s incl ~7.8 s NCCL init — the
# smallest reference config that ran this size; see BASELINE.md for the
# 8-GPU comparison) and is IN the default set since round 3 (VERDICT.md
# item 2) — its cached .npy ships in io/bench/ so the ~7 min np.load is
# the only cost. N=57344 (largest packed-triangle fit on one v5e) is
# opt-in via LAM_BENCH_SIZES: its 26 GB load would dominate the
# driver's bench window; the measured row lives in results/ instead.
BASELINES = {10000: 0.261, 20000: 0.866, 40000: 8.782}
DEFAULT_SIZES = (10000, 20000, 40000)
SIZES = tuple(int(s) for s in os.environ.get(
    "LAM_BENCH_SIZES", ",".join(map(str, DEFAULT_SIZES))).split(","))
HEADLINE_N = SIZES[0]
TOL = 1e-9
SEED = 2024


def _try_remove(path):
    try:
        os.remove(path)
    except OSError:
        pass


def _cache_paths(n):
    # io/ is gitignored and persists with the repo checkout (survives
    # session restarts, unlike /tmp) — generation at N=20000 costs ~6 min
    # on this 1-core host, so the driver's bench run must find a cache.
    here = os.path.dirname(os.path.abspath(__file__))
    name = f"lam_bench_spd_N{n}_s{SEED}.npy"
    return [os.path.join(here, "io", "bench", name),
            os.path.join("/tmp", name)]


def _system(n):
    from lam_tpu import generate as gen
    t0 = time.perf_counter()
    paths = _cache_paths(n)
    a = None
    for p in paths:
        if os.path.exists(p):
            a = np.load(p)
            break
    if a is None:
        a = gen.random_spd_matrix_fast(n, seed=SEED)
        for p in paths:
            # atomic publish: a partial write (disk full, Ctrl-C) must
            # not leave a truncated .npy at the cache path — it persists
            # (io/bench survives sessions) and would break every later
            # run at np.load
            tmp = p + ".tmp"
            try:
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(tmp, "wb") as fh:
                    np.save(fh, a)
                os.replace(tmp, p)
                break
            except OSError:
                _try_remove(tmp)
                continue  # fall through to the next cache location
            except BaseException:
                _try_remove(tmp)  # e.g. Ctrl-C mid-write
                raise
    b = gen.random_rhs(n, seed=SEED + 10)
    cached = next((pp for pp in paths if os.path.exists(pp)), None)
    return a, b, cached, time.perf_counter() - t0


def _measure(n):
    import jax

    from lam_tpu import DenseOperator, cg_solve, cg_solve_ir

    a, b, cache_path, gen_s = _system(n)
    op = DenseOperator.from_dense(a, precision="df64")
    op32 = op.as_f32()
    jax.block_until_ready(op.operand)
    bnorm = np.linalg.norm(b)

    def true_residual(x):
        r = b - a @ np.asarray(x, dtype=np.float64)
        return float(np.linalg.norm(r) / bnorm)

    def timed(fn):
        best, best_res = None, None
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            float(r.rel_residual)  # scalar readback forces execution
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, best_res = dt, r
        return best, best_res

    out = {"gen_s": round(gen_s, 2)}

    _ = cg_solve_ir(op32, op, b, max_iters=30, rel_error=1e-2)  # compile
    ir_s, res = timed(lambda: cg_solve_ir(op32, op, b, max_iters=10000,
                                          rel_error=TOL))
    out["ir"] = {"s": round(ir_s, 4), "iters": int(res.num_iters),
                 "true_rel": true_residual(res.x),
                 "converged": bool(res.converged)}

    r0 = cg_solve(op, b, max_iters=0, rel_error=TOL)  # compile
    float(r0.rel_residual)
    df_s, res = timed(lambda: cg_solve(op, b, max_iters=10000,
                                       rel_error=TOL))
    out["df64"] = {"s": round(df_s, 4), "iters": int(res.num_iters),
                   "true_rel": true_residual(res.x),
                   "converged": bool(res.converged)}

    # irfq (round 3): fully-quantized storage, 2-byte inner plane —
    # measured ~20% faster than ir end-to-end. Needs the fused native
    # pack to keep the build off the bench's critical path, and a TPU
    # (CPU interpret solves at these N would dominate the run).
    from lam_tpu import _native_io
    if (cache_path is not None and _native_io.available()
            and jax.default_backend() == "tpu"):
        del op, op32  # free the df64 pair's HBM before the fq build
        # pack_cache: the first run publishes the packed planes beside
        # the .npy (3.2x smaller than the source); every later bench
        # run (incl. the driver's) reloads them at raw disk speed,
        # skipping the single-core quantization pass
        opq = DenseOperator.from_file_fq(cache_path, pack_cache=True)
        opq32 = opq.as_f32()
        jax.block_until_ready(opq.operand)
        _ = cg_solve_ir(opq32, opq, b, max_iters=30, rel_error=1e-2,
                        inner_floor=1e-2)  # compile
        fq_s, res = timed(lambda: cg_solve_ir(
            opq32, opq, b, max_iters=10000, rel_error=TOL,
            inner_floor=1e-2))
        out["irfq"] = {"s": round(fq_s, 4), "iters": int(res.num_iters),
                       "true_rel": true_residual(res.x),
                       "converged": bool(res.converged)}
    return out


def main():
    import jax

    import lam_tpu  # noqa: F401  (x64 on)

    all_results = {n: _measure(n) for n in sorted(SIZES)}

    def best_valid(res):
        valid = {k: v for k, v in res.items()
                 if isinstance(v, dict) and v.get("converged")
                 and v.get("true_rel", 1.0) <= 2e-9}
        if not valid:
            return None, None
        k = min(valid, key=lambda k: valid[k]["s"])
        return k, valid[k]

    engine, head = best_valid(all_results[HEADLINE_N])
    if head is None:
        print(json.dumps({"metric": f"time_to_1e-9_N{HEADLINE_N}_1chip",
                          "value": None, "unit": "s", "vs_baseline": 0.0,
                          "error": "no engine reached a validated 1e-9 "
                                   "true residual",
                          "detail": all_results}))
        return 1

    secondary = {}
    for n, res in all_results.items():
        eng, v = best_valid(res)
        if v is not None:
            entry = {
                "s": v["s"], "engine": eng, "iters": v["iters"],
                "true_rel": v["true_rel"],
                "df64_s": res["df64"]["s"],
            }
            anchor = BASELINES.get(n)
            if anchor is not None:
                entry["vs_A100"] = round(anchor / v["s"], 3)
            secondary[f"N{n}"] = entry

    head_anchor = BASELINES.get(HEADLINE_N)
    print(json.dumps({
        "metric": f"time_to_1e-9_N{HEADLINE_N}_1chip",
        "value": head["s"],
        "unit": "s",
        "vs_baseline": (round(head_anchor / head["s"], 3)
                        if head_anchor else 0.0),
        "engine": engine,
        "iters": head["iters"],
        "true_rel_residual": head["true_rel"],
        "sizes": secondary,
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
