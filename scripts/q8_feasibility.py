"""Feasibility study for an int8 FIRST cascade plane ("fq8" / irq8).

Question (VERDICT r4 next-round item 1): if the INNER CG matvec reads
an int8-quantized first plane (per-tile power-of-two scales, clip +-127
=> ~2^-8 tile-relative operator error — 1 B/element, HALF the fq q1
plane's bytes and a QUARTER of the f32 hi plane), how many extra inner
iterations does the refinement loop pay, and what inner_floor is right?

Storage design under test: cascade int8 + int16 + int16 = 5 B/element
(one byte LESS than dfq/fq — capacity improves), residual after plane 3
~ 2^-8 * 2^-16 * 2^-16 = 2^-40 * max|A|_tile — the dfq class (2^-39),
which measured ZERO iteration cost with one refinement matvec per cycle
(results/MERGE_TPU_IRQ.txt: 366 iters = the ir count).

The MXU toll is modeled too: the blocked q16 kernel's per-tile products
round OPERANDS to bf16 (ops/gemv.py _gemv_q16_symm_multi_kernel,
impl="mxu"). int8 values are EXACT in bf16 (<= 8 mantissa bits), so
only the p operand pays rounding — emulated here by casting p (after
the scale fold) to ml_dtypes.bfloat16 and back per matvec.

Pure numpy emulation (no kernels): inner recurrence in f32 against the
quantized+rounded operator; outer true residual in f64 against the
exact operator — the same structure as lam_tpu/solver/cg.py _cg_ir_loop
and the round-3 study scripts/fq_feasibility.py.

Decision gate: inner bytes halve vs irfq (2 -> 1 B/element), so < 2.0x
total-inner-iteration inflation vs irfq-at-floor-1e-2 is break-even;
< 1.3x is a clear win (build the storage + wire the existing
dtype-agnostic kernels). Writes results/Q8_FEASIBILITY_r05.log.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from lam_tpu.generate import random_spd_matrix_fast, random_rhs  # noqa: E402

try:
    from ml_dtypes import bfloat16
except ImportError:  # ml_dtypes ships with jax
    bfloat16 = None

TB = 512


def _pow2(m, qmax):
    fr, k = np.frexp(m / qmax)
    return 2.0 ** (int(k) - 1 if fr == 0.5 else int(k))


def quantize_cascade(a, dtypes=("int8", "int16", "int16")):
    """Quantize every (TB, TB) tile of `a` into a cascade against
    per-tile power-of-two scales (diagonal extracted exactly first, as
    the dfq/fq layouts do). Returns (reconstructed planes as f64 list,
    full reconstruction)."""
    qmaxes = {"int8": 127.0, "int16": 32767.0}
    n = a.shape[0]
    d = np.diag(a).copy()
    r = a.copy()
    np.fill_diagonal(r, 0.0)
    planes = [np.zeros_like(a) for _ in dtypes]
    for i0 in range(0, n, TB):
        for j0 in range(0, n, TB):
            t = r[i0:i0 + TB, j0:j0 + TB].copy()
            for plane, dt in zip(planes, dtypes):
                qmax = qmaxes[dt]
                m = np.abs(t).max()
                if m == 0:
                    continue
                s = _pow2(m, qmax)
                q = np.clip(np.rint(t / s), -qmax, qmax)
                plane[i0:i0 + TB, j0:j0 + TB] = q * s
                t -= q * s            # exact: power-of-two scale
    rec = sum(planes)
    rec[np.arange(n), np.arange(n)] = d
    p0 = planes[0].copy()
    p0[np.arange(n), np.arange(n)] = d
    return p0, rec


def inner_cg_f32(a32, b32, tol, max_iters, round_p=None):
    bb = float(b32 @ b32)
    x = np.zeros_like(b32)
    r = b32.copy()
    p = b32.copy()
    rr = bb
    k = 0
    while k < max_iters and np.sqrt(rr / bb) >= tol:
        pv = p if round_p is None else round_p(p)
        ap = (a32 @ pv.astype(np.float32)).astype(np.float32)
        alpha = np.float32(rr) / np.float32(p @ ap)
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = float(r @ r)
        beta = np.float32(rr_new / rr)
        p = r + beta * p
        rr = rr_new
        k += 1
    return x, k


def ir_solve(a_exact, a_acc, a_inner32, b, floor, eps=1e-9,
             max_cycles=20, round_p=None):
    """a_acc: the operator the refinement's true-residual step reads
    (the RECONSTRUCTED cascade — models gemv_fq_symm); a_exact scores
    the final answer."""
    bb = float(b @ b)
    x = np.zeros_like(b)
    r = b - a_acc @ x
    total = 0
    cycles = 0
    while cycles < max_cycles:
        rel = np.sqrt(float(r @ r) / bb)
        if rel < eps:
            break
        rnorm = np.sqrt(float(r @ r))
        tol = min(max(eps / rel, floor), 0.99)
        d32, k = inner_cg_f32(a_inner32, (r / rnorm).astype(np.float32),
                              tol, 4000, round_p=round_p)
        x = x + d32.astype(np.float64) * rnorm
        r = b - a_acc @ x
        total += k
        cycles += 1
    true_rel = np.sqrt(float((b - a_exact @ x) @ (b - a_exact @ x)) / bb)
    return total, cycles, true_rel


def main():
    n = 4096
    a = random_spd_matrix_fast(n, seed=2024)
    b = random_rhs(n, seed=2034)
    lines = []

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    p16_0, rec16 = quantize_cascade(a, ("int16", "int16", "int16"))
    p8_0, rec8 = quantize_cascade(a, ("int8", "int16", "int16"))
    na = np.linalg.norm(a)
    emit(f"N={n}  storage err (fro-rel): fq(3xint16) "
         f"{np.linalg.norm(rec16 - a) / na:.3e}, fq8(8+16+16) "
         f"{np.linalg.norm(rec8 - a) / na:.3e}")
    emit(f"inner-plane err (fro-rel):   q16 "
         f"{np.linalg.norm(p16_0 - a) / na:.3e}, q8 "
         f"{np.linalg.norm(p8_0 - a) / na:.3e}")

    def bf16_round(p):
        if bfloat16 is None:
            return p
        return p.astype(bfloat16).astype(np.float32)

    a32 = a.astype(np.float32)
    t, c, rel = ir_solve(a, a, a32, b, 1e-5)
    emit(f"ir   (f32 inner, floor 1e-5):            {t:4d} inner iters, "
         f"{c} cycles, true rel {rel:.3e}")
    base_t, c, rel = ir_solve(a, rec16, p16_0.astype(np.float32), b,
                              1e-2, round_p=bf16_round)
    emit(f"irfq (q16+bf16 inner, floor 1e-2):       {base_t:4d} inner "
         f"iters, {c} cycles, true rel {rel:.3e}   <- shipping baseline")
    for floor in (1e-2, 3e-2, 1e-1, 2e-1, 3e-1):
        t, c, rel = ir_solve(a, rec8, p8_0.astype(np.float32), b, floor,
                             round_p=bf16_round)
        flag = " FAIL" if rel > 2e-9 else ""
        emit(f"irq8 (q8+bf16 inner, floor {floor:5g}):       {t:4d} "
             f"inner iters, {c} cycles, true rel {rel:.3e}  "
             f"x{t / base_t:.2f} vs irfq{flag}")
    # no-MXU variant (exact f32 products) isolates the bf16 toll
    t, c, rel = ir_solve(a, rec8, p8_0.astype(np.float32), b, 1e-1)
    emit(f"irq8 (q8 exact-f32 inner, floor 0.1):    {t:4d} inner iters, "
         f"{c} cycles, true rel {rel:.3e}  x{t / base_t:.2f} vs irfq")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "Q8_FEASIBILITY_r05.log")
    with open(out, "w") as fh:
        fh.write("# int8-first-plane feasibility study "
                 "(scripts/q8_feasibility.py), round 5\n")
        fh.write("# gate: <2.0x inner-iteration inflation vs irfq = "
                 "break-even (bytes halve); <1.3x = clear win\n")
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
