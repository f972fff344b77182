"""Real-chip frontier probe for the 2-byte inner engine: the largest
operator any kernel in this project has touched on hardware.

The fq cascade's inner plane is 2 B/element (ops/gemv.py
gemv_q16_symm, the `irfq` inner engine). A full fq operator caps one
16 GB v5e at N~70000 (6 B/elem), but the INNER matvec alone needs only
the q1 triangle: at N=114688 that is 13.2 GB — it fits, 1.6x beyond
the full-operator frontier and 2.9x the reference's largest
single-A100 matrix. This script:

  * builds the q1 plane of a tridiagonal {2,1} operator ENTIRELY ON
    DEVICE (walk-order int16 tiles against one power-of-two scale
    2^-14, matrix diagonal extracted as the fq layout requires — the
    {0,1} off-diagonal entries quantize exactly),
  * validates one matvec against the closed form ([3,4,...,4,3] row
    sums, exact in f32) — a hardware correctness check of the packed
    q16 walk at a scale no CPU test reaches, and
  * times a 10-matvec normalized chain (one device program, scalar
    readback per the tunnel timing rules), best-of-3.

Writes results/Q16_FRONTIER_r04.log. Needs the real TPU (~16 GB HBM);
refuses to run elsewhere.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import lam_tpu  # noqa: F401  (x64 + cache config)
from lam_tpu.ops import gemv

N = int(os.environ.get("LAM_Q16_N", 114688))
TB = 512
REPS = 10
SCALE = 2.0 ** -14            # stored entries are {0, 1} (diagonal
                              # extracted) -> q in {0, 16384}, exact


@jax.jit
def _build_q1(it, kt):
    """Walk-order q1 plane of the tridiagonal with the matrix diagonal
    zeroed (the fq layout stores it separately): within a diagonal
    tile the sub/super-diagonal 1s; in a first-subdiagonal tile the
    single corner 1 at (0, tb-1); all else 0. Built as a lax.scan over
    tiles so per-step intermediates are ONE (tb, tb) tile — a fully
    fused elementwise form was observed to materialize a full-extent
    int32 iota/gather intermediate (26 GB > HBM) at this size."""
    T = it.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (TB, TB), 1)
    band = jnp.abs(r - c) == 1
    corner = (r == 0) & (c == TB - 1)
    qval = jnp.int16(round(1.0 / SCALE))
    zero = jnp.int16(0)

    def tile(carry, ik):
        i, k = ik
        sel = jnp.where(i == k, band,
                        jnp.where(i == k + 1, corner,
                                  jnp.zeros_like(band)))
        return carry, jnp.where(sel, qval, zero)

    _, tiles = jax.lax.scan(tile, 0, (it, kt))
    return tiles.reshape(T * TB, TB)


@jax.jit
def _chain(q1, sc, p):
    def body(p, _):
        y = gemv.gemv_q16_symm(q1, sc, p) + 2.0 * p
        return y / jnp.sqrt(jnp.vdot(y, y)), None
    out, _ = jax.lax.scan(body, p, None, length=REPS)
    return out


def main():
    if jax.default_backend() != "tpu":
        print("q16_frontier: needs the real TPU (13.2 GB HBM plane); "
              "skipping on", jax.default_backend())
        return 0

    from lam_tpu.ops.gemv import _symm_tables, tri_tile_count
    assert N % TB == 0
    nblk = N // TB
    T = tri_tile_count(nblk)
    it, kt = _symm_tables(nblk)
    gib = T * TB * TB * 2 / 2**30

    lines = [f"N={N} q1 plane: {T} walk tiles, {gib:.2f} GiB int16 "
             f"(2 B/elem), device-built"]
    print(lines[-1], flush=True)

    t0 = time.time()
    q1 = _build_q1(jnp.asarray(it), jnp.asarray(kt))
    q1.block_until_ready()
    sc = jnp.full((T,), SCALE, jnp.float32)
    lines.append(f"  device build: {time.time() - t0:.1f} s")
    print(lines[-1], flush=True)

    # closed-form validation: one matvec, exact in f32
    p = jnp.ones((N,), jnp.float32)
    y = np.asarray(gemv.gemv_q16_symm(q1, sc, p) + 2.0 * p)
    expect = np.full((N,), 4.0, np.float32)
    expect[0] = expect[-1] = 3.0
    assert np.array_equal(y, expect), "closed-form matvec check failed"
    lines.append("  matvec closed-form check on hardware: exact")
    print(lines[-1], flush=True)

    # timed chain, best-of-3, scalar readback (tunnel rules)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = _chain(q1, sc, p)
        float(out[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per_mv = best / REPS
    rate = gib * 2**30 / per_mv / 1e9
    lines.append(f"  {REPS}-matvec chain best-of-3: {best:.3f} s -> "
                 f"{per_mv * 1e3:.2f} ms/matvec, {rate:.0f} GB/s "
                 f"triangle stream")
    print(lines[-1], flush=True)
    lines.append("Q16_FRONTIER OK")
    print(lines[-1])

    out_path = os.path.join(os.path.dirname(__file__), "..", "results",
                            "Q16_FRONTIER_r04.log")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("# 2-byte inner-plane frontier probe on the real v5e "
                 "(scripts/q16_frontier.py)\n")
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, out_path)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
