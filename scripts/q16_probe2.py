"""Stage-2 q16 kernel experiments on the real chip (VERDICT r4 item 1).

scripts/q16_probe.py established that the int16->f32 CONVERT is free
(convert micro == DMA floor == 503-552 GB/s) and in-register unpack
tricks (pair/magic) do NOT help — the verdict's "unpack tax" hypothesis
is dead. The remaining gap (base 312 GB/s vs floor 503 at N=40960) is
products + tree-reductions + per-grid-step overhead. This probe
measures the two structural levers:

  P       tiles per grid step (1, 2, 4): a (P*tb, tb) int16 block is
          ONE contiguous DMA (0.5/1/2 MiB), halving/quartering the
          grid-step count and its fixed costs.
  sub     transpose-tree stop depth (1 vs 8 sublanes): the df64 symm
          kernel reduces its transpose term only to 8 sublanes
          (_SYMM_T_SUBLANES) and keeps an (8, n) accumulator — full
          vreg occupancy per op; the f32/q16 step reduces all the way
          to (1, tb) per tile, paying 3 thin tree levels + a 1/8-
          occupancy accumulate per tile.

Each variant is closed-form validated on the device-built {2,1}
tridiagonal plane before timing. Big buffers are jit ARGUMENTS (a
closure bakes them into the compile request -> tunnel HTTP 413).
Timings ride REPS-deep jitted chains with one scalar readback.
Writes results/Q16_PROBE2_r04.log. Needs the real TPU.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import lam_tpu  # noqa: F401
from lam_tpu.ops import gemv
from lam_tpu.ops.gemv import _LANES, _VMEM_CAP, _lane_fold, _lane_tree

N = int(os.environ.get("LAM_Q16_N", 114688))
REPS = int(os.environ.get("LAM_Q16_REPS", 10))
SCALE = 2.0 ** -14
TB = 512


def build_q1(n, tb):
    """Device-build the walk-order q1 plane of the {2,1} tridiagonal
    with the diagonal extracted (same construction as q16_frontier),
    padded to a multiple of 4 tiles with benign (nblk-1, nblk-1, s=0)
    tiles (they re-write yd[nblk-1] with an unchanged accumulator)."""
    nblk = n // tb
    it, kt = gemv._symm_tables(nblk)
    T = len(it)
    Tp = (T + 7) // 8 * 8
    it = np.concatenate([it, np.full(Tp - T, nblk - 1, np.int32)])
    kt = np.concatenate([kt, np.full(Tp - T, nblk - 1, np.int32)])

    @jax.jit
    def _build(it, kt):
        r = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 1)
        band = jnp.abs(r - c) == 1
        corner = (r == 0) & (c == tb - 1)
        qval = jnp.int16(round(1.0 / SCALE))
        zero = jnp.int16(0)

        def tile(carry, ik):
            i, k = ik
            sel = jnp.where(i == k, band,
                            jnp.where(i == k + 1, corner,
                                      jnp.zeros_like(band)))
            return carry, jnp.where(sel, qval, zero)

        _, tiles = jax.lax.scan(tile, 0, (it, kt))
        return tiles.reshape(Tp * tb, tb)

    q1 = _build(jnp.asarray(it), jnp.asarray(kt))
    sc = np.zeros((Tp,), np.float32)
    sc[:T] = SCALE
    # pad tiles re-target the last diagonal: s=0 keeps them no-ops
    sc[T:] = 0.0
    return q1, jnp.asarray(sc), jnp.asarray(it), jnp.asarray(kt), T


def _floor_kernel(it_ref, kt_ref, sc_ref, seed_ref, x_ref, o_ref, acc):
    """Pure-stream floor: native int16 lane folds over the SAME plane
    the kernels read (no bitcast copy — a reshaped int32 view would
    materialize a second 12.3 GiB plane and OOM the chip), no
    convert/products — the DMA ceiling at this block size. The
    accumulator is SEEDED from the previous pass's output: a real data
    dependency, because any arithmetic-identity carry (c & 0, c * 0)
    gets constant-folded and the whole pass hoisted out of the scan
    (first attempt 'measured' 2.8 TB/s that way)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc[:] = seed_ref[:]

    x = x_ref[:]
    tb = acc.shape[0]
    s = acc[:]
    for rb in range(x.shape[0] // tb):
        xr = x[rb * tb:(rb + 1) * tb]
        for j in range(xr.shape[1] // _LANES):
            s = s + xr[:, j * _LANES:(j + 1) * _LANES]
    acc[:] = s

    @pl.when(t == nt - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("P",))
def floor_chain(q1, itj, ktj, sc, *, P):
    """REPS streaming passes over the int16 plane with (P*tb, tb)
    blocks; the carry feeds the prefetch table so XLA cannot hoist."""
    tb = q1.shape[1]
    Tp = q1.shape[0] // tb
    grid = (Tp // P,)

    def one(seed):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[pl.BlockSpec((tb, _LANES),
                                   lambda t, *r: (t * 0, t * 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((P * tb, tb),
                                   lambda t, *r: (t, t * 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tb, _LANES),
                                   lambda t, *r: (t * 0, t * 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tb, _LANES), jnp.int16)],
        )
        return pl.pallas_call(
            _floor_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tb, _LANES), jnp.int16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_CAP),
        )(itj, ktj, sc, seed, q1)

    def body(seed, _):
        return one(seed), None

    seed0 = jnp.zeros((tb, _LANES), jnp.int16)
    out, _ = jax.lax.scan(body, seed0, None, length=REPS)
    return out[0, 0].astype(jnp.int32)


def _multi_kernel(it_ref, kt_ref, sc_ref, q_ref, *rest, P, sub, tb):
    pr_refs = rest[:P]
    pc_refs = rest[P:2 * P]
    yd_ref, yt_ref, acc_d, acc_t = rest[2 * P:]
    t = pl.program_id(0)
    nt = pl.num_programs(0)

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
        acc_d[:] = _lane_fold(a * (pr_refs[u][:] * s), acc_d[:])

        @pl.when(k == i)
        def _():
            yd_ref[pl.dslice(i * tb, tb), :] = _lane_tree(acc_d[:])

        @pl.when(k < i)
        def _():
            w = a * (pc_refs[u][:] * s)
            width = tb
            while width > sub:
                half = width // 2
                w = w[:half] + w[half:width]
                width = half
            idx = pl.dslice(k * tb, tb)
            acc_t[:, idx] = acc_t[:, idx] + w

    @pl.when(t == nt - 1)
    def _():
        yt_ref[:] = acc_t[:]


@functools.partial(jax.jit, static_argnames=("P", "sub"))
def gemv_q16_multi(q1, sc, itj, ktj, p, *, P, sub):
    n = p.shape[0]
    tb = q1.shape[1]
    Tp = q1.shape[0] // tb
    assert Tp % P == 0
    grid = (Tp // P,)

    def pr_spec(u):
        return pl.BlockSpec(
            (1, tb),
            lambda t, i_r, k_r, s_r, u=u: (t * 0, k_r[t * P + u]),
            memory_space=pltpu.VMEM)

    def pc_spec(u):
        return pl.BlockSpec(
            (tb, 1),
            lambda t, i_r, k_r, s_r, u=u: (i_r[t * P + u], t * 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((P * tb, tb), lambda t, *r: (t, t * 0),
                          memory_space=pltpu.VMEM)]
            + [pr_spec(u) for u in range(P)]
            + [pc_spec(u) for u in range(P)]
        ),
        out_specs=(
            pl.BlockSpec((n, 1), lambda t, *r: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, n), lambda t, *r: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((sub, n), jnp.float32),
        ],
    )
    yd, yt = pl.pallas_call(
        functools.partial(_multi_kernel, P=P, sub=sub, tb=tb),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((sub, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
    )(itj, ktj, sc,
      q1, *([p.reshape(1, n)] * P), *([p.reshape(n, 1)] * P))
    return yd.reshape(n) + jnp.sum(yt, axis=0)


@jax.jit
def chain_base(q1, sc, p):
    def body(p, _):
        y = gemv.gemv_q16_symm(q1, sc, p) + 2.0 * p
        return y / jnp.sqrt(jnp.vdot(y, y)), None
    out, _ = jax.lax.scan(body, p, None, length=REPS)
    return out


@functools.partial(jax.jit, static_argnames=("P", "sub"))
def chain_multi(q1, sc, itj, ktj, p, *, P, sub):
    def body(p, _):
        y = gemv_q16_multi(q1, sc, itj, ktj, p, P=P, sub=sub) + 2.0 * p
        return y / jnp.sqrt(jnp.vdot(y, y)), None
    out, _ = jax.lax.scan(body, p, None, length=REPS)
    return out


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timed(fn, *args, **kw):
    for attempt in range(3):
        try:
            _force(fn(*args, **kw))
            break
        except Exception as e:  # noqa: BLE001
            print(f"  [warm attempt {attempt + 1}: {type(e).__name__}: "
                  f"{e}]", flush=True)
            time.sleep(3)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _force(fn(*args, **kw))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    if jax.default_backend() != "tpu":
        print("q16_probe2: needs the real TPU; skipping on",
              jax.default_backend())
        return 0

    lines = []

    def emit(s):
        lines.append(s)
        print(s, flush=True)

    p0 = jnp.ones((N,), jnp.float32)
    expect = np.full((N,), 4.0, np.float32)
    expect[0] = expect[-1] = 3.0

    q1, sc, itj, ktj, T = build_q1(N, TB)
    gib = T * TB * TB * 2 / 2**30
    emit(f"-- tb={TB}: {T} walk tiles (+{q1.shape[0] // TB - T} pad), "
         f"{gib:.2f} GiB plane, N={N}, REPS={REPS}")

    # shipping kernel (uses the unpadded tile count internally).
    # Slice ONLY when padded: a full-extent device slice would still
    # materialize a second 12.3 GiB plane next to q1 and OOM the chip.
    q1_exact = q1 if q1.shape[0] == T * TB else q1[:T * TB]
    sc_exact = sc if sc.shape[0] == T else sc[:T]
    y = np.asarray(gemv.gemv_q16_symm(q1_exact, sc_exact, p0) + 2.0 * p0)
    assert np.array_equal(y, expect), "base closed-form failed"
    t = timed(chain_base, q1_exact, sc_exact, p0) / REPS
    emit(f"  base   (shipping):        {t*1e3:7.2f} ms/mv -> "
         f"{gib * 2**30 / t / 1e9:5.0f} GB/s")

    # pure-stream DMA floor per P: int16 lane folds over the SAME
    # plane — the bandwidth ceiling each block size allows
    for P in (1, 2, 4, 8, 16):
        t = timed(floor_chain, q1, itj, ktj, sc, P=P) / REPS
        emit(f"  floor P={P} ({P * TB * TB * 2 // 1024:5d} KiB DMA): "
             f"{t*1e3:7.2f} ms/mv -> {gib * 2**30 / t / 1e9:5.0f} GB/s")

    for P in (1, 2, 4, 8, 16):
        y = np.asarray(gemv_q16_multi(q1, sc, itj, ktj, p0,
                                      P=P, sub=1) + 2.0 * p0)
        assert np.array_equal(y, expect), f"P={P} closed-form failed"
        t = timed(chain_multi, q1, sc, itj, ktj, p0, P=P, sub=1) / REPS
        emit(f"  P={P} full kernel:        {t*1e3:7.2f} ms/mv -> "
             f"{gib * 2**30 / t / 1e9:5.0f} GB/s")

    out_path = os.path.join(os.path.dirname(__file__), "..", "results",
                            "Q16_PROBE2_r04.log")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("# q16 structural levers on the real v5e "
                 "(scripts/q16_probe2.py)\n")
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, out_path)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
