"""Iteration-count recovery study for irfq (VERDICT r4 item 6, bounded).

irfq pays ~+5-7% total inner iterations over ir (385-390 vs 365
measured at N=70000; the ~2^-16 inner operator + the bf16-MXU operand
rounding). Question: can anything CHEAP claw that back? Candidates
named by the verdict:

  (a) a per-cycle inner_floor schedule — loose early cycles (the
      refinement restart absorbs coarse directions anyway), tight late;
  (b) switching the LAST cycle's inner products to the exact-f32 VPU
      walk (no bf16 operand rounding; ops/gemv.py LAM_Q16_IMPL).

Pure numpy emulation at the reference spectrum (same machinery as
scripts/q8_feasibility.py: q16 first plane + ml_dtypes bf16 rounding of
the p operand models the shipping MXU kernel). The models sweep floor
schedules and the last-cycle switch and print total inner iterations;
the decision gate is ~>=3% recovery to justify wiring a schedule into
_cg_ir_loop (solver/cg.py). Writes results/ITER_RECOVERY_r05.log.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from lam_tpu.generate import random_spd_matrix_fast, random_rhs  # noqa: E402
from scripts.q8_feasibility import (  # noqa: E402
    quantize_cascade, inner_cg_f32)

try:
    from ml_dtypes import bfloat16
except ImportError:
    bfloat16 = None


def bf16_round(p):
    if bfloat16 is None:
        return p
    return p.astype(bfloat16).astype(np.float32)


def ir_solve_sched(a_exact, a_acc, a_inner32, b, floors, eps=1e-9,
                   max_cycles=20, round_p=bf16_round,
                   last_cycle_exact=False):
    """IR with a per-cycle floor schedule. floors[min(cyc, len-1)] is
    cycle cyc's inner_floor. last_cycle_exact: when the PREDICTED inner
    tolerance eps/rel exceeds the schedule floor (i.e. this cycle can
    finish the job), drop the bf16 rounding — models dispatching the
    final cycle to the exact-f32 VPU kernel."""
    bb = float(b @ b)
    x = np.zeros_like(b)
    r = b.copy()
    total = 0
    cycles = 0
    per_cycle = []
    while cycles < max_cycles:
        rel = np.sqrt(float(r @ r) / bb)
        if rel < eps:
            break
        floor = floors[min(cycles, len(floors) - 1)]
        tol = min(max(eps / rel, floor), 0.99)
        finishing = eps / rel >= floor
        rp = None if (last_cycle_exact and finishing) else round_p
        rnorm = np.sqrt(float(r @ r))
        d32, k = inner_cg_f32(a_inner32, (r / rnorm).astype(np.float32),
                              tol, 4000, round_p=rp)
        x = x + d32.astype(np.float64) * rnorm
        r = b - a_acc @ x
        total += k
        per_cycle.append(k)
        cycles += 1
    true_rel = np.sqrt(float((b - a_exact @ x) @ (b - a_exact @ x)) / bb)
    return total, per_cycle, true_rel


def main():
    n = 4096
    a = random_spd_matrix_fast(n, seed=2024)
    b = random_rhs(n, seed=2034)
    p16_0, rec16 = quantize_cascade(a, ("int16", "int16", "int16"))
    q16 = p16_0.astype(np.float32)
    lines = []

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    a32 = a.astype(np.float32)
    t, pc, rel = ir_solve_sched(a, a, a32, b, [1e-5], round_p=None)
    emit(f"ir   (f32 inner, floor 1e-5):      {t:4d} iters {pc} "
         f"true {rel:.2e}")
    base, pc, rel = ir_solve_sched(a, rec16, q16, b, [1e-2])
    emit(f"irfq (shipping: flat floor 1e-2):  {base:4d} iters {pc} "
         f"true {rel:.2e}   <- baseline")

    emit("--- (a) floor schedules (loose early, tight late) ---")
    schedules = {
        "flat 3e-2":           [3e-2],
        "flat 3e-3":           [3e-3],
        "flat 1e-3":           [1e-3],
        "3e-2 then 1e-2":      [3e-2, 1e-2],
        "1e-1,3e-2,1e-2":      [1e-1, 3e-2, 1e-2],
        "1e-2 then 1e-3":      [1e-2, 1e-3],
        "3e-2,1e-2,1e-3":      [3e-2, 1e-2, 1e-3],
        "1e-1 then 1e-3":      [1e-1, 1e-3],
    }
    for name, fl in schedules.items():
        t, pc, rel = ir_solve_sched(a, rec16, q16, b, fl)
        flag = " FAIL" if rel > 2e-9 else ""
        emit(f"  {name:22s} {t:4d} iters {pc} true {rel:.2e}  "
             f"{t - base:+d}{flag}")

    emit("--- (b) last-cycle exact-f32 (VPU) switch ---")
    for name, fl in (("flat 1e-2 + exact last", [1e-2]),
                     ("3e-2,1e-2 + exact last", [3e-2, 1e-2]),
                     ("flat 3e-3 + exact last", [3e-3])):
        t, pc, rel = ir_solve_sched(a, rec16, q16, b, fl,
                                    last_cycle_exact=True)
        flag = " FAIL" if rel > 2e-9 else ""
        emit(f"  {name:22s} {t:4d} iters {pc} true {rel:.2e}  "
             f"{t - base:+d}{flag}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "ITER_RECOVERY_r05.log")
    with open(out, "w") as fh:
        fh.write("# irfq iteration-recovery study "
                 "(scripts/iter_recovery.py), round 5\n")
        fh.write("# gate: >=3% total-inner-iteration recovery justifies "
                 "wiring a floor schedule into _cg_ir_loop\n")
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
