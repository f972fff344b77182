"""Feasibility study for a fully-quantized inner plane ("fq").

Question: if the INNER CG matvec reads an int16-quantized hi plane
(per-tile power-of-two scales, ~2^-15 tile-relative error — 2 B/element,
HALF the f32 hi plane's bytes), how many extra inner iterations does the
refinement loop pay, and what inner_floor is right?

Pure numpy emulation (no kernels): inner recurrence in f32 against the
quantized operator; outer true residual in f64 against the exact
operator — the same structure as lam_tpu/solver/cg.py::_cg_ir_loop.
Decision gate (see docs/REPORT.md): build the Pallas kernels only if
total inner iterations inflate < ~1.6x (bytes halve, so <2.0x is
break-even before dequantize cost; <1.3x is a clear win).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from lam_tpu.generate import random_spd_matrix_fast, random_rhs  # noqa: E402

TB = 512


def quantize_tiles(a):
    """int16-quantize every (TB, TB) tile of `a` (diagonal entries
    extracted exactly first, as the dfq layout does)."""
    n = a.shape[0]
    d = np.diag(a).copy()
    aq = a.copy()
    np.fill_diagonal(aq, 0.0)
    out = np.zeros_like(a)
    for i0 in range(0, n, TB):
        for j0 in range(0, n, TB):
            t = aq[i0:i0 + TB, j0:j0 + TB]
            m = np.abs(t).max()
            if m == 0:
                continue
            fr, k = np.frexp(m / 32767.0)
            s = 2.0 ** (int(k) - 1 if fr == 0.5 else int(k))
            q = np.clip(np.rint(t / s), -32767, 32767)
            out[i0:i0 + TB, j0:j0 + TB] = q * s
    out[np.arange(n), np.arange(n)] = d
    return out


def inner_cg_f32(a32, b32, tol, max_iters):
    """f32 CG recurrence (matches _cg_loop's update order/stopping)."""
    bb = float(b32 @ b32)
    x = np.zeros_like(b32)
    r = b32.copy()
    p = b32.copy()
    rr = bb
    k = 0
    while k < max_iters and np.sqrt(rr / bb) >= tol:
        ap = (a32 @ p.astype(np.float32)).astype(np.float32)
        alpha = np.float32(rr) / np.float32(p @ ap)
        x = x + alpha * p
        r = r - alpha * ap
        rr_new = float(r @ r)
        beta = np.float32(rr_new / rr)
        p = r + beta * p
        rr = rr_new
        k += 1
    return x, k


def ir_solve(a_exact, a_inner32, b, floor, eps=1e-9, max_cycles=14):
    bb = float(b @ b)
    x = np.zeros_like(b)
    r = b.copy()
    total = 0
    cycles = 0
    hist = []
    while cycles < max_cycles:
        rel = np.sqrt(float(r @ r) / bb)
        hist.append(rel)
        if rel < eps:
            break
        rnorm = np.sqrt(float(r @ r))
        tol = min(max(eps / rel, floor), 0.99)
        d32, k = inner_cg_f32(a_inner32, (r / rnorm).astype(np.float32),
                              tol, 4000)
        x = x + d32.astype(np.float64) * rnorm
        r = b - a_exact @ x
        total += k
        cycles += 1
    rel = np.sqrt(float(r @ r) / bb)
    return total, cycles, rel, hist


def main():
    n = 4096
    a = random_spd_matrix_fast(n, seed=2024)
    b = random_rhs(n, seed=2034)
    a32 = a.astype(np.float32)
    aq = quantize_tiles(a)
    aq32 = aq.astype(np.float32)
    print(f"N={n}  quant err (fro, offdiag-rel): "
          f"{np.linalg.norm(aq - a) / np.linalg.norm(a):.3e}")

    t, c, rel, hist = ir_solve(a, a32, b, 1e-5)
    print(f"ir (f32 inner, floor 1e-5):  {t} inner iters, {c} cycles, "
          f"true rel {rel:.3e}")
    for floor in (1e-5, 1e-3, 1e-2, 3e-2, 1e-1):
        t, c, rel, hist = ir_solve(a, aq32, b, floor)
        print(f"fq (int16 inner, floor {floor:g}): {t} inner iters, "
              f"{c} cycles, true rel {rel:.3e}  "
              f"cycle-rels {['%.1e' % h for h in hist]}")


if __name__ == "__main__":
    main()
