"""Small-N probe, part 2: where does the ~41 ms per-CALL fixed cost
come from?

Part 1 (results/SMALL_N_r05.log) fit the fixed-iteration inner-CG runs
at N=10000 to t(k) ~= 41 ms + 0.145 ms * k: the marginal iteration is
already at ~780 GB/s effective (ABOVE the measured 404 GB/s seeded-DMA
"floor" at this plane size — the floor chain overestimates small
passes), so bandwidth is NOT the small-N story; the per-call intercept
is. Candidates, each measured here:

  dispatch   bare tunnel round-trip on a trivial jitted scalar op
  entry      _cg_loop program entry/exit at k=0/1 (setup: bb, zeros,
             first cond eval) — intercept minus dispatch
  readback   CGResult x transfer (40 KB) — x[0] vs full np.asarray(x)

t(k) is sampled at k in {1, 50, 100, 200, 400, 800, 1600}, 5 calls
each, min taken (tunnel noise is one-sided), least-squares fit on the
top half. Writes results/SMALL_N2_r05.log.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import lam_tpu  # noqa: F401
from lam_tpu import DenseOperator
from lam_tpu import generate as gen
from lam_tpu.solver.cg import _cg_loop

LOG = os.path.join(os.path.dirname(__file__), "..", "results",
                   "SMALL_N2_r05.log")
N = 10000
SEED = 2024
CACHE = os.path.join(os.path.dirname(__file__), "..", "io", "bench",
                     f"lam_bench_spd_N{N}_s{SEED}.npy")


def emit(line, fh):
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def tmin(fn, reps=5):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    fh = open(LOG, "w")
    emit("# small-N fixed-cost decomposition "
         "(scripts/small_n_probe2.py), round 5", fh)
    if jax.default_backend() != "tpu":
        emit(f"ABORT: needs a real TPU, have {jax.default_backend()}",
             fh)
        return 1

    # bare dispatch: trivial jitted op, scalar readback
    @jax.jit
    def triv(x):
        return x + 1.0

    xs = jnp.float32(1.0)
    float(triv(xs))
    disp = tmin(lambda: float(triv(xs)), 10)
    emit(f"  dispatch (jit scalar +1, readback): {disp * 1e3:7.2f} ms",
         fh)

    opq = DenseOperator.from_file_fq(CACHE, pack_cache=True)
    opq32 = opq.as_f32()
    b = gen.random_rhs(N, seed=SEED + 10)
    b32 = opq32.prepare_b(b.astype(np.float32))
    jax.block_until_ready(opq.operand)

    def fixed_iters(k):
        return opq32.run_cg(_cg_loop, b32, jnp.int32(k),
                            np.float32(1e-30))

    float(fixed_iters(4).rel_residual)  # compile once

    ks = (1, 50, 100, 200, 400, 800, 1600)
    ts = []
    for k in ks:
        dt = tmin(lambda k=k: float(fixed_iters(k).rel_residual))
        ts.append(dt)
        emit(f"  t(k={k:5d}) = {dt * 1e3:8.2f} ms "
             f"({dt / k * 1e3:6.3f} ms/iter raw)", fh)
    # slope from the top half (least sensitive to the intercept)
    kk = np.array(ks[-3:], float)
    tt = np.array(ts[-3:], float)
    slope, icept = np.polyfit(kk, tt, 1)
    emit(f"  fit (k>=400): {icept * 1e3:.1f} ms + "
         f"{slope * 1e3:.3f} ms/iter "
         f"(-> {113e6 / slope / 1e9:.0f} GB/s effective)", fh)
    emit(f"  t(k=1) - dispatch = {(ts[0] - disp) * 1e3:.2f} ms "
         f"(loop entry/exit + one pass)", fh)

    # readback size: x[0] scalar vs the full padded x
    res = fixed_iters(400)
    jax.block_until_ready(res.x)
    t_sc = tmin(lambda: float(fixed_iters(400).rel_residual))
    t_full = tmin(lambda: np.asarray(fixed_iters(400).x).sum())
    emit(f"  k=400 scalar readback {t_sc * 1e3:.1f} ms vs full-x "
         f"readback {t_full * 1e3:.1f} ms (delta "
         f"{(t_full - t_sc) * 1e3:+.1f} ms)", fh)

    # reference points: the production solve and its pieces
    from lam_tpu import cg_solve_ir
    from lam_tpu.solver.cg import default_inner_floor
    floor = default_inner_floor("irfq")
    _ = cg_solve_ir(opq32, opq, b, max_iters=30, rel_error=1e-2,
                    inner_floor=floor)
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        r = cg_solve_ir(opq32, opq, b, max_iters=10000, rel_error=1e-9,
                        inner_floor=floor)
        float(r.rel_residual)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    emit(f"  production irfq solve: {best * 1e3:.1f} ms "
         f"({int(r.num_iters)} inner iters)", fh)
    fh.close()
    return 0


if __name__ == "__main__":
    t0 = time.time()
    rc = main()
    print(f"[{time.time() - t0:.0f}s]", file=sys.stderr)
    sys.exit(rc)
