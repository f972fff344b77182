"""Feasibility study: host-computed EXACT f64 outer residuals for irfq.

Question (round 5): the warm N=70000 irfq load moves 14.7 GB through a
~44 MB/s tunnel, but the q2/q3 cascade planes (9.8 GB of it) are read
ONLY by the ~6 outer refinement residual computations
(solver/cg.py _cg_ir_loop; the inner matvec reads the 2 B/element q1
plane alone). The host holds the exact f64 source (it read it to pack)
and streams a matvec at ~10.7 GB/s page-cached (measured, N=40000
memmap) — so computing `r = b - A x` HOST-side per cycle would (a) cut
tunnel traffic to the 4.9 GB q1 plane + diagonal, and (b) make the
outer operator EXACT instead of 2^-48-reconstructed.

This study asks what that does to CONVERGENCE: same inner operator
(q16 + bf16 MXU rounding), outer residual against the exact f64
operator instead of the reconstructed cascade. Gate: total inner
iterations within +-2% of shipping irfq and TRUE residual <= 1e-9
=> wire it (the byte savings are already measured facts).

Pure numpy emulation, same machinery as scripts/q8_feasibility.py
(quantize_cascade / inner_cg_f32 / ir_solve). Writes
results/HOST_OUTER_r05.log.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lam_tpu.generate import random_spd_matrix_fast, random_rhs  # noqa: E402
from q8_feasibility import (bfloat16, inner_cg_f32,  # noqa: E402
                            quantize_cascade)


def ir_solve_sched(a_exact, a_acc, a_inner32, b, floors, eps=1e-9,
                   max_cycles=20, round_p=None):
    """scripts/q8_feasibility.ir_solve with a per-cycle floor SCHEDULE
    (cycle c uses floors[min(c, len-1)] — solver/cg.py semantics) and
    per-cycle iteration counts in the return."""
    bb = float(b @ b)
    x = np.zeros_like(b)
    r = b - a_acc @ x
    per_cycle = []
    cycles = 0
    while cycles < max_cycles:
        rel = np.sqrt(float(r @ r) / bb)
        if rel < eps:
            break
        floor = floors[min(cycles, len(floors) - 1)]
        rnorm = np.sqrt(float(r @ r))
        tol = min(max(eps / rel, floor), 0.99)
        d32, k = inner_cg_f32(a_inner32, (r / rnorm).astype(np.float32),
                              tol, 4000, round_p=round_p)
        x = x + d32.astype(np.float64) * rnorm
        r = b - a_acc @ x
        per_cycle.append(k)
        cycles += 1
    true_rel = np.sqrt(float((b - a_exact @ x) @ (b - a_exact @ x)) / bb)
    return sum(per_cycle), per_cycle, true_rel


def main():
    n = 4096
    a = random_spd_matrix_fast(n, seed=2024)
    b = random_rhs(n, seed=2034)
    lines = []

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    emit("# host-exact-outer feasibility (scripts/host_outer_feasibility.py), round 5")
    emit("# gate: total inner iters within +-2% of shipping irfq AND true rel <= 1e-9")
    p16_0, rec16 = quantize_cascade(a, ("int16", "int16", "int16"))

    def bf16_round(p):
        if bfloat16 is None:
            return p
        return p.astype(bfloat16).astype(np.float32)

    a_inner = p16_0.astype(np.float32)
    for name, floors in (("flat 1e-2", (1e-2,)),
                         ("sched (3e-2, 1e-2)", (3e-2, 1e-2))):
        t0, pc0, rel0 = ir_solve_sched(a, rec16, a_inner, b, floors,
                                       round_p=bf16_round)
        emit(f"irfq device-outer, {name:20s} {t0:4d} iters {pc0} "
             f"true rel {rel0:.3e}   <- shipping")
        t1, pc1, rel1 = ir_solve_sched(a, a, a_inner, b, floors,
                                       round_p=bf16_round)
        flag = "FAIL" if rel1 > 1e-9 or abs(t1 - t0) > 0.02 * t0 else "PASS"
        emit(f"irfq HOST-exact-outer, {name:17s} {t1:4d} iters {pc1} "
             f"true rel {rel1:.3e}  {t1 - t0:+d} vs shipping {flag}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "HOST_OUTER_r05.log")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
