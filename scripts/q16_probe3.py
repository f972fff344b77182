"""Stage-3 q16 kernel experiments: what sets the 650 GB/s DMA floor?

Round-4 state (results/Q16_PROBE2_r04.log, Q16_FRONTIER_r04.log): the
blocked P=8 grid ships at 601 GB/s against a measured 650 GB/s
seeded-DMA floor at N=114688 — but the f32 packed-symm kernel sustains
713 GB/s at N=57344 (results/N57K_r03.log). Two hypotheses for the
63 GB/s floor gap, each with a discriminating measurement:

  footprint  the q16 floor was only ever measured on a 12.3 GiB plane
             (77% of HBM); the f32 713 was on 6.6 GiB (41%). Measure
             the SAME q16 floor + full kernel at N=57344 (3.08 GiB
             plane). Floor ~713 there => the 650 is HBM-occupancy
             droop, not dtype/grid structure.
  tile size  tb=1024 quarters the walk-step count and doubles the
             bytes per (P*tb, tb) DMA row block. Measure floor + full
             kernel at tb=1024 (P=2/4) at N=114688.

Plus the one unmeasured full-kernel lever from probe2: sub=8 stops the
transpose tree at 8 sublanes (full-vreg adds into an (8, n)
accumulator; the df64 symm kernel's _SYMM_T_SUBLANES trick) instead of
paying 3 thin tree levels per tile.

Reuses probe2's device-built {2,1}-tridiagonal plane, closed-form
validation, and seeded-floor methodology. Writes
results/Q16_PROBE3_r04.log. Needs the real TPU.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import q16_probe2 as p2

LOG = os.path.join(os.path.dirname(__file__), "..", "results",
                   "Q16_PROBE3_r04.log")


def run_size(emit, n, tb, floor_ps, full_ps, subs=(1,)):
    q1, sc, itj, ktj, T = p2.build_q1(n, tb)
    gib = T * tb * tb * 2 / 2**30
    emit(f"-- N={n} tb={tb}: {T} walk tiles "
         f"(+{q1.shape[0] // tb - T} pad), {gib:.2f} GiB plane, "
         f"REPS={p2.REPS}")
    bytes_total = q1.shape[0] * tb * 2  # incl. pad tiles: what streams

    expect = np.full((n,), 4.0, np.float32)
    expect[0] = expect[-1] = 3.0
    p0 = jnp.ones((n,), jnp.float32)

    for P in floor_ps:
        dt = p2.timed(p2.floor_chain, q1, itj, ktj, sc, P=P)
        ms = dt / p2.REPS * 1e3
        gbs = bytes_total / (dt / p2.REPS) / 1e9
        emit(f"  floor P={P:2d} ({P * tb * tb * 2 // 1024:5d} KiB DMA):"
             f" {ms:7.2f} ms/pass -> {gbs:5.0f} GB/s")

    for P in full_ps:
        for sub in subs:
            y = np.asarray(
                p2.gemv_q16_multi(q1, sc, itj, ktj, p0, P=P, sub=sub)
            ) + 2.0
            err = float(np.max(np.abs(y - expect)))
            if err > 1e-4:
                emit(f"  full P={P} sub={sub}: VALIDATION FAILED "
                     f"max|err|={err:.2e} — skipping timing")
                continue
            dt = p2.timed(p2.chain_multi, q1, sc, itj, ktj, p0,
                          P=P, sub=sub)
            ms = dt / p2.REPS * 1e3
            gbs = bytes_total / (dt / p2.REPS) / 1e9
            emit(f"  full  P={P:2d} sub={sub}: {ms:7.2f} ms/mv "
                 f"-> {gbs:5.0f} GB/s")
    # free the plane before the next size
    del q1, sc, itj, ktj


def main():
    if jax.default_backend() != "tpu":
        print("q16_probe3: needs the real TPU; skipping on",
              jax.default_backend())
        return 0

    lines = ["# q16 floor decomposition (scripts/q16_probe3.py), "
             "round 4"]

    def emit(s):
        lines.append(s)
        print(s, flush=True)

    # 1. footprint: the probe2 config at HALF the footprint
    run_size(emit, 57344, 512, floor_ps=(8,), full_ps=(8,),
             subs=(1, 8))
    # 2. tile size: tb=1024 at the full footprint
    run_size(emit, 114688, 1024, floor_ps=(2, 4), full_ps=(2, 4))
    # 3. sub lever at the shipping config
    run_size(emit, 114688, 512, floor_ps=(), full_ps=(8,), subs=(8,))

    with open(LOG, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {LOG}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
