"""Small-N overhead probe (round 5, VERDICT item 8).

N<=16384 irfq solves sit above the large-N bandwidth line:
results/Q16_PROBE3_r04.log measured the pure-DMA floor itself dropping
from 646 GB/s (12.3 GiB plane) to 429 GB/s (3.1 GiB), and the N=10000
solve (BENCH_r04: 0.1095 s / 384 iters ~= 0.285 ms/iter over a 113 MB
plane) implies ~2x the large-N bandwidth line. Decompose where the
per-iteration time goes at N=10000 and run ONE experiment (VERDICT:
"then close the lever either way"):

  (1) production matvec ms/pass on the real cached system (the
      operator's own matvec_chain — no per-call dispatch),
  (2) full inner-CG marginal ms/iteration (fixed-iteration run pairs:
      the difference cancels dispatch + setup) -> the vector/loop
      overhead slice on top of (1),
  (3) the pure-DMA floor at this plane size (probe2's seeded floor
      chain on a device-built plane, same geometry),
  (4) EXPERIMENT — tile size tb=1024 at the same N: 4x fewer walk
      steps, 4x larger contiguous DMA rows (56 tiles -> 7 grid steps
      at P=8). If per-grid-step overhead is what lifts small-N off
      the floor, this collapses it; measured floor + full kernel +
      production chain on a tb=1024 device-built plane.

Reference comparator: the N=10000 single-A100 row solves in 0.261 s
(TESTS/BEST_RESULTS:362) — already beaten 2.4x; this probe is about
the distance to OUR OWN floor, not the anchor.

Needs the real TPU and the cached N=10000 bench system. Writes
results/SMALL_N_r05.log.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import lam_tpu  # noqa: F401  (x64, platform)
from lam_tpu import DenseOperator
from lam_tpu import generate as gen
from lam_tpu.ops import gemv
from lam_tpu.solver.cg import _cg_loop

import q16_probe2 as p2

LOG = os.path.join(os.path.dirname(__file__), "..", "results",
                   "SMALL_N_r05.log")
N = 10000
SEED = 2024
CACHE = os.path.join(os.path.dirname(__file__), "..", "io", "bench",
                     f"lam_bench_spd_N{N}_s{SEED}.npy")


def emit(line, fh):
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


@functools.partial(jax.jit, static_argnames=("reps",))
def chain_prod(q1, sc, p, *, reps):
    """reps production gemv_q16_symm passes in one program (normalized
    to stay bounded) on an arbitrary device-built plane."""
    def body(p, _):
        y = gemv.gemv_q16_symm(q1, sc, p) + 2.0 * p
        return y / jnp.sqrt(jnp.vdot(y, y)), None
    out, _ = jax.lax.scan(body, p, None, length=reps)
    return out


def main():
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    fh = open(LOG, "w")
    emit("# small-N overhead probe (scripts/small_n_probe.py), round 5",
         fh)
    if jax.default_backend() != "tpu":
        emit(f"ABORT: needs a real TPU, have {jax.default_backend()}",
             fh)
        return 1
    if not os.path.exists(CACHE):
        emit(f"ABORT: no cached system at {CACHE}", fh)
        return 1

    reps = int(os.environ.get("LAM_SMALLN_REPS", 200))
    p2.REPS = reps  # probe2's floor/multi chains read the module global

    # ---- (1) + (2): the real operator off the cached system ----
    opq = DenseOperator.from_file_fq(CACHE, pack_cache=True)
    opq32 = opq.as_f32()
    b = gen.random_rhs(N, seed=SEED + 10)
    b32 = opq32.prepare_b(b.astype(np.float32))
    jax.block_until_ready(opq.operand)
    tb = opq.operand[0].shape[1]
    n_p = opq32.n_padded
    T = opq.operand[0].shape[0] // tb
    plane_mb = opq.operand[0].size * 2 / 1e6
    emit(f"-- production operand: N={N} n_p={n_p} tb={tb} T={T} "
         f"plane {plane_mb:.0f} MB, REPS={reps}", fh)

    pv = b32 / jnp.sqrt(jnp.vdot(b32, b32))
    dt = p2.timed(opq32.matvec_chain, pv, reps)
    mv_ms = dt / reps * 1e3
    gbs = plane_mb / 1e3 / (dt / reps)
    emit(f"  (1) production matvec   {mv_ms:7.3f} ms/mv -> "
         f"{gbs:5.0f} GB/s", fh)

    def fixed_iters(k):
        return opq32.run_cg(_cg_loop, b32, jnp.int32(k),
                            np.float32(1e-30))

    lo, hi = 2 * reps, 4 * reps
    for k in (lo, hi):  # compile both shapes... same program (dynamic k)
        float(fixed_iters(k).rel_residual)
    t_lo = p2.timed(fixed_iters, lo)
    t_hi = p2.timed(fixed_iters, hi)
    it_ms = (t_hi - t_lo) / (hi - lo) * 1e3
    emit(f"  (2) inner-CG marginal   {it_ms:7.3f} ms/iter "
         f"(pairs {lo}/{hi}: {t_lo * 1e3:.1f}/{t_hi * 1e3:.1f} ms) -> "
         f"vector+loop slice {it_ms - mv_ms:+.3f} ms "
         f"({(it_ms - mv_ms) / it_ms * 100:.0f}%)", fh)

    del opq, opq32

    # ---- (3) + (4): device-built planes, floor vs full vs tile size --
    expect_err = {}
    for tb_x in (512, 1024):
        n_x = (N + tb_x - 1) // tb_x * tb_x
        q1, sc, itj, ktj, T_x = p2.build_q1(n_x, tb_x)
        Tp = q1.shape[0] // tb_x
        mb = q1.size * 2 / 1e6
        emit(f"-- device-built {{2,1}} plane: n_p={n_x} tb={tb_x} "
             f"T={T_x} (+{Tp - T_x} pad), {mb:.0f} MB", fh)
        for P in (8, 4) if tb_x == 1024 else (8,):
            if Tp % P:
                continue
            dt = p2.timed(p2.floor_chain, q1, itj, ktj, sc, P=P)
            ms = dt / reps * 1e3
            emit(f"  (3) floor P={P} ({P * tb_x * tb_x * 2 // 1024} KiB"
                 f" DMA): {ms:7.3f} ms/pass -> "
                 f"{mb / 1e3 / (dt / reps):5.0f} GB/s", fh)
        # production kernel on this plane (validates vs the closed form)
        p0 = jnp.ones((n_x,), jnp.float32)
        y = np.asarray(gemv.gemv_q16_symm(q1, sc, p0)) + 2.0
        expect = np.full((n_x,), 4.0, np.float32)
        expect[0] = expect[-1] = 3.0
        err = float(np.max(np.abs(y - expect)))
        expect_err[tb_x] = err
        if err > 1e-4:
            emit(f"  (4) tb={tb_x}: VALIDATION FAILED max|err|={err:.2e}"
                 f" — skipping timing", fh)
            del q1, sc, itj, ktj
            continue
        dt = p2.timed(chain_prod, q1, sc, p0, reps=reps)
        ms = dt / reps * 1e3
        emit(f"  (4) production kernel tb={tb_x}: {ms:7.3f} ms/mv -> "
             f"{mb / 1e3 / (dt / reps):5.0f} GB/s "
             f"(max|err| {err:.1e})", fh)
        del q1, sc, itj, ktj

    emit("# verdict appended by hand after reading the numbers", fh)
    fh.close()
    return 0


if __name__ == "__main__":
    t0 = time.time()
    rc = main()
    print(f"[{time.time() - t0:.0f}s]", file=sys.stderr)
    sys.exit(rc)
