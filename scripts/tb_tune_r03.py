"""Round-3 tile-width sweep for the packed symmetric kernels.

An early N=20480 probe showed the packed f32 triangle matvec at
tb=1024 running ~24% faster than the tb=512 default (458 vs 374 GB/s):
fewer grid steps amortize per-tile overheads (accumulator flushes, the
transpose tree) over 4x the elements. This script measures matvec
chains at N=20480 for f32 / df64 / dfq packed storage across tile
widths, then a FULL irq+dfq solve at N=40000 with the winning width,
to decide whether the SYMM_TB default should move. (An earlier variant
packed N=40000 three times on the 1-core host — ~40 min of prep that a
single tunnel hiccup discarded; chains at 20480 carry the same signal
at a quarter of the pack cost, and the solve-level check runs once.)

Run: python scripts/tb_tune_r03.py | tee -a results/TB_TUNE_r03.log
"""

import os
import sys
import threading
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_CHAIN = 20480
N_SOLVE = 40000
SOLVE_TB = 1024       # challenger; incumbent record is tb=512, 1.732 s
SEED = 2024


def _retry(fn, what, tries=3):
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # tunnel hiccups (broken pipe etc.)
            print(f"  [{what}: attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {e}]", flush=True)
            if attempt == tries - 1:
                raise
            time.sleep(20)


def main():
    import jax
    import jax.numpy as jnp

    import lam_tpu  # noqa: F401
    import lam_tpu.ops.gemv as gv
    from lam_tpu.ops.gemv import (gemv_df64_symm, gemv_dfq_symm,
                                  gemv_f32_symm, pack_tri_host,
                                  quantize_lo_tiles)
    from lam_tpu.solver.operators import split_f64_host

    assert jax.default_backend() == "tpu", jax.default_backend()
    print("device:", jax.devices()[0], flush=True)

    # The tunnel's compile endpoint drops connections that sit idle
    # through long host-side phases (gen/pack measured ~30 min on this
    # 1-core VM; two sweep attempts died with remote_compile "Broken
    # pipe" right after them). A tiny device op every 30 s keeps the
    # channel warm; paused during timed sections.
    keepalive_on = threading.Event()
    keepalive_on.set()

    def _keepalive():
        z = jnp.zeros((8, 128))
        while True:
            if keepalive_on.is_set():
                try:
                    float(z.sum())
                except Exception:
                    pass
            time.sleep(30)

    threading.Thread(target=_keepalive, daemon=True).start()

    def chain_time(mv, ops, p0, reps=50):
        # ops are passed as ARGUMENTS: a closed-over matrix becomes an
        # HLO constant and ships inside the compile request (the tunnel
        # rejected an 860 MB request with HTTP 413; the earlier
        # broken-pipe deaths were the same oversized upload)
        @jax.jit
        def chain(ops, p):
            def body(_, v):
                w = mv(ops, v)
                return w / jnp.sqrt(jnp.vdot(w, w))
            return jax.lax.fori_loop(0, reps, body, p)

        def once():
            out = chain(ops, p0)
            return float(jnp.vdot(out, out))

        keepalive_on.clear()          # quiet device during timing
        try:
            _retry(once, "compile+warm")
            t0 = time.perf_counter()
            once()
            return (time.perf_counter() - t0) / reps
        finally:
            keepalive_on.set()

    # -- matvec chains at N_CHAIN across tile widths -----------------------
    from lam_tpu import generate as gen
    cache = os.path.join(HERE, "io", "bench",
                         f"lam_tune_spd_N{N_CHAIN}_s{SEED}.npy")
    if os.path.exists(cache):
        a = np.load(cache)
    else:
        a = gen.random_spd_matrix_fast(N_CHAIN, seed=SEED)
        tmp = cache + ".tmp"
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(tmp, "wb") as fh:
            np.save(fh, a)
        os.replace(tmp, cache)
    rng = np.random.default_rng(0)

    for tb in (512, 1024, 2048):
        n_p = -(-N_CHAIN // tb) * tb
        ap = np.zeros((n_p, n_p), np.float64)
        ap[:N_CHAIN, :N_CHAIN] = a
        hi, lo = split_f64_host(ap)
        hip = pack_tri_host(hi, tb)
        p32 = jnp.asarray(rng.uniform(-1, 1, n_p), jnp.float32)
        gb32 = hip.nbytes / 1e9
        hj = jnp.asarray(hip)
        dt = chain_time(lambda o, v: gemv_f32_symm(o, v, packed=True),
                        hj, p32)
        print(f"tb={tb} f32 : {dt*1e3:7.3f} ms  {gb32:5.2f} GB  "
              f"{gb32/dt:4.0f} GB/s", flush=True)
        if tb <= 1024:  # df64 pair at tb=2048 exceeds the VMEM budget
            lop = pack_tri_host(lo, tb)
            lj = jnp.asarray(lop)
            gb = (hip.nbytes + lop.nbytes) / 1e9
            dt = chain_time(
                lambda o, v: gemv_df64_symm(
                    o[0], o[1], v.astype(jnp.float32),
                    jnp.zeros_like(v, jnp.float32), packed=True)[0],
                (hj, lj), p32)
            print(f"tb={tb} df64: {dt*1e3:7.3f} ms  {gb:5.2f} GB  "
                  f"{gb/dt:4.0f} GB/s", flush=True)
            q, sc = quantize_lo_tiles(lop, tb)
            qj, scj = jnp.asarray(q), jnp.asarray(sc)
            gbq = (hip.nbytes + q.nbytes) / 1e9
            dt = chain_time(
                lambda o, v: gemv_dfq_symm(
                    o[0], o[1], o[2], v.astype(jnp.float32),
                    jnp.zeros_like(v, jnp.float32))[0],
                (hj, qj, scj), p32)
            print(f"tb={tb} dfq : {dt*1e3:7.3f} ms  {gbq:5.2f} GB  "
                  f"{gbq/dt:4.0f} GB/s", flush=True)
        del ap, hi, lo, hip

    # -- full irq+dfq solve at N_SOLVE with the challenger width -----------
    from lam_tpu import DenseOperator, cg_solve_ir
    path = os.path.join(HERE, "io", "bench",
                        f"lam_bench_spd_N{N_SOLVE}_s{SEED}.npy")
    if not os.path.exists(path):
        print(f"[skip solve: no cached system at {path}]", flush=True)
        return
    gv.SYMM_TB = SOLVE_TB
    am = np.load(path, mmap_mode="r")
    b = gen.random_rhs(N_SOLVE, seed=SEED + 10)
    t0 = time.time()
    op = DenseOperator.from_file_dfq(path)   # native fused pack
    print(f"dfq pack at tb={SOLVE_TB}: {time.time()-t0:.0f}s "
          f"(padded {op.n_padded})", flush=True)
    op32 = op.as_f32()
    keepalive_on.clear()
    _retry(lambda: float(cg_solve_ir(op32, op, b, max_iters=30,
                                     rel_error=1e-2).rel_residual),
           "solve compile")
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        res = cg_solve_ir(op32, op, b, max_iters=10000, rel_error=1e-9)
        float(res.rel_residual)
        dt = time.perf_counter() - t0
        print(f"  rep{rep}: {dt:.3f}s iters={int(res.num_iters)} "
              f"conv={bool(res.converged)}", flush=True)
        best = dt if best is None else min(best, dt)
    keepalive_on.set()
    bn = np.linalg.norm(b)
    x = np.asarray(res.x, np.float64)[:N_SOLVE]
    r = b.copy()
    blk = 4096
    for s in range(0, N_SOLVE, blk):
        r[s:s + blk] -= am[s:s + blk] @ x
    print(f"irq+dfq N={N_SOLVE} tb={SOLVE_TB}: {best:.3f}s "
          f"TRUE={np.linalg.norm(r)/bn:.3e} "
          f"[incumbent tb=512: 1.732 s]", flush=True)


if __name__ == "__main__":
    main()
