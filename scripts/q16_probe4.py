"""Stage-4 q16 kernel experiment: move the per-tile products to the MXU.

Probe 1-3 ledger (results/Q16_PROBE{,2,3}_r04.log): the int16->f32
convert is free, in-register unpack tricks lose, the blocked P=8 grid
ships at 601 GB/s against a 650 GB/s seeded-DMA floor at N=114688, and
neither tb=1024 nor sub=8 moves the full kernel. What remains between
601 and 650 is the VPU work per tile: two (tb, tb) elementwise products
plus a lane fold (diagonal term) and a full halving tree (transpose
term) — roughly the same wall-clock per step as the 4 MiB DMA itself,
so any scheduling hiccup serializes.

Both terms are matvecs, and the f32 full-matrix kernel already ships
its matvec on the MXU (`_gemv_f32_kernel_dot`). This probe rebuilds the
blocked q16 step with dot_general per tile:

    diag      (tb,1) += a @ (p_k * s)      contract a dim1 x pr dim1
    transpose (1,tb) += (p_i * s) @ a      contract pi dim1 x a dim0

(the transpose operand becomes a (1, tb) ROW view so the MXU result
lands directly in the (1, n) accumulator slice — no Mosaic transpose).

Variants:
    mxu-hi    both terms dot_general precision=HIGHEST (bf16x3 passes,
              ~f32-faithful — the shippable candidate)
    mxu-def   default precision (bf16x1): accuracy floor for the
              operator error, but the MXU-throughput ceiling
    hybrid    diagonal on VPU lane-fold (cheap), transpose on MXU
              (the halving tree is the expensive VPU piece)

Each variant is closed-form validated on the device-built {2,1}
tridiagonal plane before timing; the seeded DMA floor is re-measured in
the SAME run so tunnel bandwidth drift (~20% observed) cancels out of
the comparison. Writes results/Q16_PROBE4_r04.log. Needs the real TPU.
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import lam_tpu  # noqa: F401
from lam_tpu.ops.gemv import _LANES, _VMEM_CAP, _lane_fold, _lane_tree

import q16_probe2 as p2

N = int(os.environ.get("LAM_Q16_N", 114688))
TB = 512
LOG = os.path.join(os.path.dirname(__file__), "..", "results",
                   "Q16_PROBE4_r04.log")

_PRECISIONS = {"hi": jax.lax.Precision.HIGHEST,
               "def": jax.lax.Precision.DEFAULT}


def _mxu_kernel(it_ref, kt_ref, sc_ref, q_ref, *rest, P, tb, mode):
    """Blocked q16 step with MXU products. Operand views are all
    (1, tb) rows: pr[u] = p[k-block] (diagonal term), pi[u] = p[i-block]
    (transpose term)."""
    pr_refs = rest[:P]
    pi_refs = rest[P:2 * P]
    yd_ref, yt_ref, acc_d, acc_t = rest[2 * P:]
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    prec = _PRECISIONS[mode] if mode in _PRECISIONS else None

    @pl.when(t == 0)
    def _():
        acc_t[:] = jnp.zeros_like(acc_t)

    for u in range(P):
        g = t * P + u
        i = it_ref[g]
        k = kt_ref[g]
        s = sc_ref[g]

        @pl.when(k == 0)
        def _():
            acc_d[:] = jnp.zeros_like(acc_d)

        a = q_ref[u * tb:(u + 1) * tb, :].astype(jnp.float32)
        if mode == "split":
            # EXACT bf16 decomposition of the int16 values: ah rounds
            # to 8 mantissa bits (error <= half an ulp = 64 at the
            # int16 range) and the remainder al is an integer of <= 7
            # bits — exactly representable in bf16. a == ah + al, so
            # only the p operand is bf16-rounded (backward error on p,
            # not on the stored operator).
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)

        if mode == "hybrid":
            acc_d[:] = _lane_fold(a * (pr_refs[u][:] * s), acc_d[:])
        elif mode == "split":
            # COLUMN operands: the bf16 row-operand dot ((1,tb)x(tb,tb))
            # trips a Mosaic vector.broadcast verification error; the
            # column form ((tb,tb)x(tb,1)) lowers clean.
            pbk = (pr_refs[u][:] * s).astype(jnp.bfloat16)  # (tb, 1)
            d = jax.lax.dot_general(
                ah, pbk, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d = d + jax.lax.dot_general(
                al, pbk, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_d[:] = acc_d[:] + d
        else:
            # (tb, tb) @ (tb,) row-operand: contract a dim1 x pr dim1
            d = jax.lax.dot_general(
                a, pr_refs[u][:] * s,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            acc_d[:] = acc_d[:] + d  # (tb, 1)

        @pl.when(k == i)
        def _():
            if mode == "hybrid":
                yd_ref[pl.dslice(i * tb, tb), :] = _lane_tree(acc_d[:])
            else:
                yd_ref[pl.dslice(i * tb, tb), :] = acc_d[:]

        @pl.when(k < i)
        def _():
            if mode == "split":
                pbi = (pi_refs[u][:] * s).astype(jnp.bfloat16)  # (tb, 1)
                w = jax.lax.dot_general(
                    ah, pbi, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                w = w + jax.lax.dot_general(
                    al, pbi, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                w = w.T                      # (tb,1) -> (1,tb)
            else:
                # (1, tb) @ (tb, tb): contract pi dim1 x a dim0 -> (1, tb)
                w = jax.lax.dot_general(
                    pi_refs[u][:] * s, a,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST
                    if mode == "hybrid" else prec)
            idx = pl.dslice(k * tb, tb)
            acc_t[:, idx] = acc_t[:, idx] + w

    @pl.when(t == nt - 1)
    def _():
        yt_ref[:] = acc_t[:]


@functools.partial(jax.jit, static_argnames=("P", "mode"))
def gemv_q16_mxu(q1, sc, itj, ktj, p, *, P, mode):
    n = p.shape[0]
    tb = q1.shape[1]
    Tp = q1.shape[0] // tb
    assert Tp % P == 0
    grid = (Tp // P,)
    acc_d_shape = (tb, _LANES) if mode == "hybrid" else (tb, 1)

    def row_spec(table, u):
        if mode == "split":  # column views for the bf16 column dots
            if table == "k":
                return pl.BlockSpec(
                    (tb, 1),
                    lambda t, i_r, k_r, s_r, u=u: (k_r[t * P + u], t * 0),
                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                (tb, 1),
                lambda t, i_r, k_r, s_r, u=u: (i_r[t * P + u], t * 0),
                memory_space=pltpu.VMEM)
        if table == "k":
            return pl.BlockSpec(
                (1, tb),
                lambda t, i_r, k_r, s_r, u=u: (t * 0, k_r[t * P + u]),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, tb),
            lambda t, i_r, k_r, s_r, u=u: (t * 0, i_r[t * P + u]),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((P * tb, tb), lambda t, *r: (t, t * 0),
                          memory_space=pltpu.VMEM)]
            + [row_spec("k", u) for u in range(P)]
            + [row_spec("i", u) for u in range(P)]
        ),
        out_specs=(
            pl.BlockSpec((n, 1), lambda t, *r: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t, *r: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(acc_d_shape, jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    pview = p.reshape(n, 1) if mode == "split" else p.reshape(1, n)
    yd, yt = pl.pallas_call(
        functools.partial(_mxu_kernel, P=P, tb=tb, mode=mode),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
    )(itj, ktj, sc, q1, *([pview] * (2 * P)))
    return yd.reshape(n) + yt.reshape(n)


@functools.partial(jax.jit, static_argnames=("P", "mode"))
def chain_mxu(q1, sc, itj, ktj, p, *, P, mode):
    def body(p, _):
        y = gemv_q16_mxu(q1, sc, itj, ktj, p, P=P, mode=mode) + 2.0 * p
        return y / jnp.sqrt(jnp.vdot(y, y)), None
    out, _ = jax.lax.scan(body, p, None, length=p2.REPS)
    return out


def main():
    if jax.default_backend() != "tpu":
        print("q16_probe4: needs the real TPU; skipping on",
              jax.default_backend())
        return 0

    lines = ["# q16 MXU-product variants (scripts/q16_probe4.py), "
             "round 4"]

    def emit(s):
        lines.append(s)
        print(s, flush=True)

    q1, sc, itj, ktj, T = p2.build_q1(N, TB)
    gib = T * TB * TB * 2 / 2**30
    bytes_total = q1.shape[0] * TB * 2
    emit(f"-- N={N} tb={TB}: {T} walk tiles "
         f"(+{q1.shape[0] // TB - T} pad), {gib:.2f} GiB plane, "
         f"REPS={p2.REPS}")

    expect = np.full((N,), 4.0, np.float32)
    expect[0] = expect[-1] = 3.0
    p0 = jnp.ones((N,), jnp.float32)

    # same-run baselines: seeded DMA floor + shipping-form VPU kernel
    dt = p2.timed(p2.floor_chain, q1, itj, ktj, sc, P=8)
    emit(f"  floor   P=8: {dt / p2.REPS * 1e3:7.2f} ms/pass -> "
         f"{bytes_total / (dt / p2.REPS) / 1e9:5.0f} GB/s")
    y = np.asarray(p2.gemv_q16_multi(q1, sc, itj, ktj, p0,
                                     P=8, sub=1) + 2.0 * p0)
    assert np.array_equal(y, expect), "vpu closed-form failed"
    dt = p2.timed(p2.chain_multi, q1, sc, itj, ktj, p0, P=8, sub=1)
    emit(f"  vpu     P=8: {dt / p2.REPS * 1e3:7.2f} ms/mv   -> "
         f"{bytes_total / (dt / p2.REPS) / 1e9:5.0f} GB/s  (shipping form)")

    for mode in ("hi", "def", "split", "hybrid"):
        try:
            y = np.asarray(gemv_q16_mxu(q1, sc, itj, ktj, p0,
                                        P=8, mode=mode) + 2.0 * p0)
        except Exception as e:  # noqa: BLE001
            emit(f"  mxu-{mode:6s}: FAILED to build/run: "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:90]}")
            continue
        err = float(np.max(np.abs(y - expect)))
        if err > 1e-4:
            emit(f"  mxu-{mode:6s}: VALIDATION FAILED max|err|={err:.2e}")
            continue
        dt = p2.timed(chain_mxu, q1, sc, itj, ktj, p0, P=8, mode=mode)
        emit(f"  mxu-{mode:4s}P=8: {dt / p2.REPS * 1e3:7.2f} ms/mv   -> "
             f"{bytes_total / (dt / p2.REPS) / 1e9:5.0f} GB/s")

    with open(LOG, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {LOG}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
