"""Round-3 tile-width sweep for the packed symmetric kernels.

An N=20480 probe showed the packed f32 triangle matvec at tb=1024
running 24% faster than the tb=512 default (458 vs 374 GB/s): fewer
grid steps amortize per-tile overheads (accumulator flushes, the
transpose tree) over 4x the elements. This script measures matvec
chains at N=40960 (the largest cached size that packs quickly) for
f32 / df64 / dfq packed storage across tile widths, then a full irq
solve at the winning width, to decide whether SYMM_TB/DF64_SYMM_TB
defaults should move.

Run: python scripts/tb_tune_r03.py | tee -a results/TB_TUNE_r03.log
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N = 40000
SEED = 2024


def main():
    import jax
    import jax.numpy as jnp

    import lam_tpu  # noqa: F401
    from lam_tpu.ops.gemv import (gemv_df64_symm, gemv_dfq_symm,
                                  gemv_f32_symm, pack_tri_host,
                                  quantize_lo_tiles)
    from lam_tpu.solver.operators import split_f64_host

    assert jax.default_backend() == "tpu", jax.default_backend()
    print("device:", jax.devices()[0], flush=True)
    a = np.load(os.path.join(HERE, "io", "bench",
                             f"lam_bench_spd_N{N}_s{SEED}.npy"),
                mmap_mode="r")
    rng = np.random.default_rng(0)

    def chain_time(mv, p0, reps=50):
        @jax.jit
        def chain(p):
            def body(_, v):
                w = mv(v)
                return w / jnp.sqrt(jnp.vdot(w, w))
            return jax.lax.fori_loop(0, reps, body, p)

        out = chain(p0)
        float(jnp.vdot(out, out))
        t0 = time.perf_counter()
        out = chain(p0)
        float(jnp.vdot(out, out))
        return (time.perf_counter() - t0) / reps

    for tb in (512, 1024, 2048):
        n_p = -(-N // tb) * tb
        ap = np.zeros((n_p, n_p), np.float64)
        ap[:N, :N] = a
        hi, lo = split_f64_host(ap)
        hip = pack_tri_host(hi, tb)
        p32 = jnp.asarray(rng.uniform(-1, 1, n_p), jnp.float32)
        gb32 = hip.nbytes / 1e9
        dt = chain_time(lambda v: gemv_f32_symm(jnp.asarray(hip), v,
                                                packed=True), p32)
        print(f"tb={tb} f32 : {dt*1e3:7.3f} ms  {gb32:5.2f} GB  "
              f"{gb32/dt:4.0f} GB/s", flush=True)
        if tb <= 1024:  # df64 pair at tb=2048 exceeds the VMEM budget
            lop = pack_tri_host(lo, tb)
            ph, pl = (jnp.asarray(x) for x in split_f64_host(
                rng.uniform(-1, 1, n_p)))
            hj, lj = jnp.asarray(hip), jnp.asarray(lop)
            gb = (hip.nbytes + lop.nbytes) / 1e9
            dt = chain_time(
                lambda v: gemv_df64_symm(hj, lj, v.astype(jnp.float32),
                                         jnp.zeros_like(ph), packed=True
                                         )[0], p32)
            print(f"tb={tb} df64: {dt*1e3:7.3f} ms  {gb:5.2f} GB  "
                  f"{gb/dt:4.0f} GB/s", flush=True)
            q, sc = quantize_lo_tiles(lop, tb)
            qj, scj = jnp.asarray(q), jnp.asarray(sc)
            gbq = (hip.nbytes + q.nbytes) / 1e9
            dt = chain_time(
                lambda v: gemv_dfq_symm(hj, qj, scj,
                                        v.astype(jnp.float32),
                                        jnp.zeros_like(ph))[0], p32)
            print(f"tb={tb} dfq : {dt*1e3:7.3f} ms  {gbq:5.2f} GB  "
                  f"{gbq/dt:4.0f} GB/s", flush=True)
        del ap, hi, lo, hip


if __name__ == "__main__":
    main()
