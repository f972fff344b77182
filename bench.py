"""Headline benchmark: dense-CG time-to-1e-9 on one TPU chip.

BASELINE.json names the metric "time-to-1e-9 residual at N=10k and
N=70k". The headline line keeps the round-1..3 shape (N=10000 against
the reference's single-A100 anchor, 0.261 s, TESTS/BEST_RESULTS:362)
and adds the north-star leg: the N=70000 irfq solve on ONE v5e
(39 GB fp64 in the reference's storage — needed 8x A100-40GB there,
1.672 s, TESTS/BEST_RESULTS:378). The N=70000 leg is gated on a cached
system + the native pack + a real TPU so the driver's bench window is
the warm pack-cache load (92-380 s, page-cache dependent; round-5
streamed pipeline), not a 75-minute generation; progress
goes to stderr, the one JSON line to stdout.

Every size is scored against EVERY applicable reference anchor
(VERDICT r3 item 7): `vs_*` = absolute wall-clock ratio, `per_chip_*` =
(anchor_s x anchor_chips) / our_s — A100-seconds per v5e-second. The
4x A100 NCCL anchor includes ~7.8 s of NCCL init (the reference pays it
every run); the 8x A100 MPI anchor is the harder row — both are
emitted so neither can be mistaken for the whole story.

Systems use the reference construction (eigenvalues exp(3.5*U(-1,1)),
random orthogonal similarity, random U(-1,1) rhs); every solve's TRUE
residual is validated host-side in f64. Engines: df64 = float-float
Pallas (f64-parity), ir = f32 iterations + df64 iterative refinement,
irfq = refinement on fully-quantized storage (2-byte inner plane).
Each engine is timed best-of-3 (the remote tunnel shows sporadic
multi-x stalls and ~20% bandwidth drift) with scalar readbacks
(block_until_ready can no-op through the tunnel).

Prints exactly one JSON line:
  {"metric": ..., "value": s, "unit": "s", "vs_baseline": speedup, ...}
vs_baseline > 1 means faster than the reference A100.
"""

import json
import os
import sys
import time

import numpy as np

# Reference anchors (BASELINE.md / TESTS/BEST_RESULTS): per size, a
# tuple of (name, chips, seconds). The FIRST anchor is the primary one
# for that size's vs_A100 field; all are emitted as vs_<name> +
# per_chip_<name>.
#   N=10000: 1x A100 0.261 s (:362); 8x A100 MPI 0.194 s (:365)
#   N=20000: 1x A100 0.866 s (:366)
#   N=40000: 4x A100 NCCL 8.782 s incl ~7.8 s init (:439);
#            8x A100 MPI 0.651 s (:374)
#   N=70000: 8x A100 MPI 1.672 s (:378) — the north star; no smaller
#            reference config ever ran this size (39 GB fp64)
ANCHORS = {
    10000: (("A100x1", 1, 0.261), ("A100x8_mpi", 8, 0.194)),
    20000: (("A100x1", 1, 0.866),),
    40000: (("A100x4_nccl", 4, 8.782), ("A100x8_mpi", 8, 0.651)),
    70000: (("A100x8_mpi", 8, 1.672),),
}
DEFAULT_SIZES = (10000, 20000, 40000, 70000)
SIZES = tuple(int(s) for s in os.environ.get(
    "LAM_BENCH_SIZES", ",".join(map(str, DEFAULT_SIZES))).split(","))
HEADLINE_N = SIZES[0]
NORTH_STAR_N = 70000
# above this, the df64/ir operand pairs exceed one v5e's 16 GB HBM;
# only the 6 B/element fq cascade fits (BASELINE.md capacity table)
BIG_FIT_N = 60000
TOL = 1e-9
SEED = 2024


def _progress(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _try_remove(path):
    try:
        os.remove(path)
    except OSError:
        pass


def _cache_paths(n):
    # io/ is gitignored and persists with the repo checkout for the
    # rest of the round — generation at N=20000 costs ~6 min on this
    # 1-core host (N=70000 ~75 min), so the driver's bench run must
    # find a cache (scripts/gen_bench_caches.py builds them).
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
        _progress(f"N={n}: no cached system, generating (~minutes)")
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


def _measure_big(n):
    """North-star leg (N > BIG_FIT_N): irfq only — the df64/ir pairs
    exceed one chip's HBM; the 6 B/element fq cascade (2-byte inner
    plane) is the layout that fits. Gated hard so the driver's window
    is never spent generating a 39 GB system from scratch."""
    import jax

    from lam_tpu import DenseOperator, _native_io, cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.solver.cg import default_inner_floor

    cache_path = next((p for p in _cache_paths(n) if os.path.exists(p)),
                      None)
    if cache_path is None:
        return {"skipped": "no cached system "
                           "(run scripts/gen_bench_caches.py)"}
    if not _native_io.available():
        return {"skipped": "native pack library unavailable"}
    if jax.default_backend() != "tpu":
        return {"skipped":
                f"needs a real TPU, have {jax.default_backend()}"}

    b = gen.random_rhs(n, seed=SEED + 10)
    bnorm = np.linalg.norm(b)

    # answer-from-cold leg FIRST (outer='host', round 5): only the q1
    # plane crosses the link, outer residuals stream the f64 source
    # host-side — measured 10.5x less time-to-answer than the full
    # cascade load (results/N70K_HOST_OUTER_r05.log). Runs before the
    # full load so its 4.9 GB q1 buffers are freed ahead of the
    # 14.7 GB cascade upload (both never fit a 16 GB chip together).
    host_outer = None
    try:
        from lam_tpu import cg_solve_ir_host
        from lam_tpu.solver.host_outer import host_matvec
        _progress(f"N={n}: outer=host leg — q1-only load")
        t0 = time.perf_counter()
        op_q1 = DenseOperator.from_file_fq_q1(cache_path,
                                              pack_cache=True)
        jax.block_until_ready(op_q1.operand)
        ho_load = time.perf_counter() - t0
        mv = host_matvec(np.load(cache_path, mmap_mode="r"))
        cg_solve_ir_host(mv, op_q1, b, max_iters=0)  # compile
        ho_best = None
        for _rep in range(3):
            t0 = time.perf_counter()
            ho_res = cg_solve_ir_host(mv, op_q1, b, max_iters=10000,
                                      rel_error=TOL)
            ho_dt = time.perf_counter() - t0
            if ho_best is None or ho_dt < ho_best[0]:
                ho_best = (ho_dt, ho_res)
        ho_dt, ho_res = ho_best
        # rel_residual IS a true residual here: r = b - A x against
        # the exact f64 source (host_outer.py)
        host_outer = {
            "load_s": round(ho_load, 1), "s": round(ho_dt, 3),
            "load_plus_solve_s": round(ho_load + ho_dt, 1),
            "iters": int(ho_res.num_iters),
            "true_rel": float(ho_res.rel_residual),
            "converged": bool(ho_res.converged)}
        _progress(f"N={n}: outer=host answered in "
                  f"{ho_load + ho_dt:.1f} s (load {ho_load:.1f} + "
                  f"solve {ho_dt:.1f}); loading the full cascade for "
                  f"the resident-operator leg")
        del op_q1, ho_res, ho_best, mv  # free q1 HBM before the upload
    except Exception as e:  # never lose the headline leg to the extra
        _progress(f"N={n}: outer=host leg failed ({e!r}); continuing")

    _progress(f"N={n}: loading fq planes (warm pack cache 92-380 s "
              f"depending on page cache, cold pack ~610 s)")
    t0 = time.perf_counter()
    opq = DenseOperator.from_file_fq(cache_path, pack_cache=True)
    opq32 = opq.as_f32()
    jax.block_until_ready(opq.operand)
    load_s = time.perf_counter() - t0
    _progress(f"N={n}: resident in {load_s:.0f} s; compiling + solving")

    floor = default_inner_floor("irfq")  # measured (3e-2, 1e-2) schedule
    _ = cg_solve_ir(opq32, opq, b, max_iters=30, rel_error=1e-2,
                    inner_floor=floor)  # compile
    best = None
    for _rep in range(3):
        t0 = time.perf_counter()
        res = cg_solve_ir(opq32, opq, b, max_iters=10000, rel_error=TOL,
                          inner_floor=floor)
        float(res.rel_residual)  # scalar readback forces execution
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, res)
    dt, res = best

    # TRUE residual against the source f64 matrix, streamed off disk in
    # row blocks (the 39 GB square never fits host RAM twice over)
    _progress(f"N={n}: solved in {dt:.3f} s; validating true residual "
              f"(one streamed pass over the {8 * n * n / 1e9:.0f} GB "
              f"source)")
    a = np.load(cache_path, mmap_mode="r")
    x = np.asarray(res.x, np.float64)
    r = b.copy()
    blk = 4096
    for s in range(0, n, blk):
        r[s:s + blk] -= a[s:s + blk] @ x
    true_rel = float(np.linalg.norm(r) / bnorm)
    # end-to-end time-to-answer (VERDICT r4 item 3): the headline solve
    # number alone hides that this tool is LOAD-bound at this size —
    # the reference's honest comparator is its own load+solve
    # (13.3 s MPI-IO + 1.672 s on 8x A100, MERGE_GPU_MPI.txt 70000,8 row)
    out = {"load_s": round(load_s, 1),
           "load_plus_solve_s": round(load_s + dt, 1),
           "irfq": {"s": round(dt, 4), "iters": int(res.num_iters),
                    "true_rel": true_rel,
                    "converged": bool(res.converged)}}
    if host_outer is not None:
        out["host_outer"] = host_outer
    return out


def _measure(n):
    import jax

    from lam_tpu import DenseOperator, cg_solve, cg_solve_ir

    if n > BIG_FIT_N:
        return _measure_big(n)

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
        from lam_tpu.solver.cg import default_inner_floor
        floor = default_inner_floor("irfq")
        opq = DenseOperator.from_file_fq(cache_path, pack_cache=True)
        opq32 = opq.as_f32()
        jax.block_until_ready(opq.operand)
        _ = cg_solve_ir(opq32, opq, b, max_iters=30, rel_error=1e-2,
                        inner_floor=floor)  # compile
        fq_s, res = timed(lambda: cg_solve_ir(
            opq32, opq, b, max_iters=10000, rel_error=TOL,
            inner_floor=floor))
        out["irfq"] = {"s": round(fq_s, 4), "iters": int(res.num_iters),
                       "true_rel": true_residual(res.x),
                       "converged": bool(res.converged)}
    return out


def _anchor_fields(n, our_s):
    """vs_<anchor> (absolute wall-clock ratio) and per_chip_<anchor>
    (anchor chip-seconds per v5e-second) for every anchor at size n."""
    fields = {}
    for name, chips, anchor_s in ANCHORS.get(n, ()):
        fields[f"vs_{name}"] = round(anchor_s / our_s, 3)
        if chips > 1:
            fields[f"per_chip_{name}"] = round(anchor_s * chips / our_s,
                                               3)
    return fields


def main():
    import jax

    import lam_tpu  # noqa: F401  (x64 on)

    all_results = {}
    for n in sorted(SIZES):
        _progress(f"measuring N={n}")
        all_results[n] = _measure(n)

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
        if "skipped" in res:
            secondary[f"N{n}"] = {"skipped": res["skipped"]}
            continue
        eng, v = best_valid(res)
        if v is not None:
            entry = {"s": v["s"], "engine": eng, "iters": v["iters"],
                     "true_rel": v["true_rel"]}
            if "df64" in res:
                entry["df64_s"] = res["df64"]["s"]
            if "load_s" in res:
                entry["load_s"] = res["load_s"]
            if "load_plus_solve_s" in res:
                entry["load_plus_solve_s"] = res["load_plus_solve_s"]
            if "host_outer" in res:
                entry["host_outer"] = res["host_outer"]
            entry.update(_anchor_fields(n, v["s"]))
            secondary[f"N{n}"] = entry

    # a headline size outside ANCHORS (e.g. the documented 57344 opt-in
    # via LAM_BENCH_SIZES) has no reference row: vs_baseline degrades
    # to 0.0 instead of crashing after the full measurement run
    head_anchors = ANCHORS.get(HEADLINE_N)
    out = {
        "metric": f"time_to_1e-9_N{HEADLINE_N}_1chip",
        "value": head["s"],
        "unit": "s",
        "vs_baseline": (secondary[f"N{HEADLINE_N}"].get(
            f"vs_{head_anchors[0][0]}", 0.0) if head_anchors else 0.0),
        "engine": engine,
        "iters": head["iters"],
        "true_rel_residual": head["true_rel"],
        "sizes": secondary,
        "device": str(jax.devices()[0]),
    }

    # the north star BASELINE.json names: time-to-1e-9 at N=70000.
    # 39 GB fp64 — the reference needed 8x A100-40GB (1.672 s); this is
    # ONE 16 GB v5e with 6 B/element quantized storage.
    ns = all_results.get(NORTH_STAR_N)
    if ns is not None and "irfq" in ns and ns["irfq"].get("converged") \
            and ns["irfq"].get("true_rel", 1.0) <= 2e-9:
        v = ns["irfq"]
        out["north_star"] = {
            "metric": f"time_to_1e-9_N{NORTH_STAR_N}_1chip",
            "value": v["s"], "unit": "s",
            "iters": v["iters"], "true_rel_residual": v["true_rel"],
            "load_s": ns["load_s"],
            # end-to-end time-to-answer vs the reference's own
            # load+solve: 13.3 s MPI-IO read + 1.672 s solve on
            # 8x A100 across 2 nodes (MERGE_GPU_MPI.txt row 70000,8)
            "load_plus_solve_s": ns["load_plus_solve_s"],
            "ref_load_plus_solve_s_8xA100": 13.3 + 1.672,
            **_anchor_fields(NORTH_STAR_N, v["s"]),
        }
        if "host_outer" in ns and ns["host_outer"].get("converged") \
                and ns["host_outer"].get("true_rel", 1.0) <= 2e-9:
            # answer-from-cold configuration (outer='host'): q1-only
            # upload + host-exact outer residuals — the honest
            # time-to-answer comparator against the reference's 15.0 s
            out["north_star"]["host_outer"] = ns["host_outer"]

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
