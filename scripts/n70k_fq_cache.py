"""North-star refresh: N=70000 irfq on ONE v5e, with the pack cache.

Round 3 measured the fully-quantized north star at 3.759 s
(results/N70K_FQ_r03.log) but paid 856 s of load: a 39.2 GB disk read
at ~132 MB/s plus a single-core triple-quantize. This script re-runs
the measurement through `from_file_fq(pack_cache=True)`
(solver/pack_cache.py) and times BOTH loads:

  cold  = fused native pack + cache publish (one-time)
  warm  = raw sequential read of the 14.9 GB packed planes

so the corpus records the reload cost a user actually pays after the
first run — the TPU-era answer to the reference's read_time column
(MPI-IO re-reads the raw fp64 file every run,
ConjugateGradient_CPU_MPI_OMP.hpp:325-363).

Builds io/bench/lam_bench_spd_N70000_s2024.npy first if missing
(~75 min single-core). Run:
    python scripts/n70k_fq_cache.py | tee -a results/N70K_FQ_CACHE_r03.log
"""

import os
import sys
import threading
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N = 70000
SEED = 2024
TOL = 1e-9


def ensure_matrix(path):
    if os.path.exists(path):
        return
    from lam_tpu import generate as gen
    print(f"generating N={N} SPD system (single-core, ~75 min)...",
          flush=True)
    t0 = time.time()
    a = gen.random_spd_matrix_fast(N, seed=SEED)
    print(f"  generated in {time.time()-t0:.0f}s; writing...", flush=True)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as fh:
        np.save(fh, a)
    os.replace(tmp, path)
    print(f"  published {path}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import lam_tpu  # noqa: F401
    from lam_tpu import DenseOperator, cg_solve_ir
    from lam_tpu import generate as gen

    assert jax.default_backend() == "tpu", jax.default_backend()
    print("device:", jax.devices()[0], flush=True)

    path = os.path.join(HERE, "io", "bench",
                        f"lam_bench_spd_N{N}_s{SEED}.npy")
    ensure_matrix(path)

    # keep the tunnel compile channel warm through the long host pack
    def _keepalive():
        z = jnp.zeros((8, 128))
        while True:
            try:
                float(z.sum())
            except Exception:
                pass
            time.sleep(30)

    threading.Thread(target=_keepalive, daemon=True).start()

    b = gen.random_rhs(N, seed=SEED + 10)
    bn = np.linalg.norm(b)

    # cold load: fused native pack + cache publish
    t0 = time.time()
    op = DenseOperator.from_file_fq(path, pack_cache=True)
    jax.block_until_ready(op.operand)
    cold_s = time.time() - t0
    print(f"cold load (pack + publish + upload): {cold_s:.1f}s", flush=True)

    # warm load: packed planes straight off disk (drop the page cache's
    # help where we can't control it — report wall time as measured)
    del op
    t0 = time.time()
    op = DenseOperator.from_file_fq(path, pack_cache=True)
    jax.block_until_ready(op.operand)
    warm_s = time.time() - t0
    print(f"warm load (cache read + upload):     {warm_s:.1f}s", flush=True)

    op32 = op.as_f32()

    def true_rel(x):
        a = np.load(path, mmap_mode="r")
        x = np.asarray(x, np.float64)
        r = b.copy()
        blk = 4096
        for s in range(0, N, blk):
            r[s:s + blk] -= a[s:s + blk] @ x
        return float(np.linalg.norm(r) / bn)

    t0 = time.time()
    w = cg_solve_ir(op32, op, b, max_iters=30, rel_error=1e-2,
                    inner_floor=1e-2)
    float(w.rel_residual)
    print(f"compile+first-execute {time.time()-t0:.0f}s", flush=True)

    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        res = cg_solve_ir(op32, op, b, max_iters=10000, rel_error=TOL,
                          inner_floor=1e-2)
        float(res.rel_residual)
        dt = time.perf_counter() - t0
        print(f"  rep{rep}: {dt:.3f}s iters={int(res.num_iters)} "
              f"conv={bool(res.converged)} "
              f"rec={float(res.rel_residual):.3e}", flush=True)
        if best is None or dt < best[0]:
            best = (dt, res)
    dt, res = best
    tr = true_rel(res.x)
    print(f"NORTH STAR irfq N={N}: {dt:.4f} s  iters "
          f"{int(res.num_iters)}  rec {float(res.rel_residual):.4e}  "
          f"TRUE {tr:.4e}  cold_load {cold_s:.1f} s  warm_load "
          f"{warm_s:.1f} s", flush=True)
    print("[anchor: 8x A100-40GB MPI 1.672 s (TESTS/BEST_RESULTS:378); "
          "this is ONE 16 GB v5e]", flush=True)

    iters = max(int(res.num_iters), 1)
    row = (f"{N},1,1,{warm_s:g},{dt/iters:g},{dt/iters:g},"
           f"{int(res.num_iters)},{tr:g},{dt:g}")
    with open(os.path.join(HERE, "results", "MERGE_TPU_IRFQ.txt"),
              "a") as fh:
        fh.write(row + "\n")
    print("row appended:", row, flush=True)


if __name__ == "__main__":
    main()
