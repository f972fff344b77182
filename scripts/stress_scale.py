"""Stress-scale analog of the reference's STRESS_TEST sweep
(/root/reference/TESTS/results/STRESS_TEST_GPU_MPI.txt: N up to 560000
across 64 GPUs). Only one real TPU chip is reachable here, so the
wall-clock rows cannot be reproduced on hardware — what CAN be proven,
and what this script records, is the sharded PROGRAM far beyond the
single-chip frontier, in two legs sized to this host's limits:

  * CAPACITY leg (N=147456, 2.1x the measured N=70000 north-star):
    construct the band-pair packed-triangle operator (41 GiB of f32
    triangle) on an 8-shard virtual mesh, entirely device-built (no
    host matrix), and validate every shard's walk layout against the
    closed-form tridiagonal (shard-LOCAL check, no collective). Host
    limits that size it: the XLA:CPU matvec materializes an
    elementwise product the size of the triangle (no Mosaic fusion
    off-TPU), so peak RSS is ~2x the plane and N=180224 OOMs this
    125 GB host; and XLA:CPU's collective rendezvous hard-aborts when
    the 8 one-core "devices" skew >40 s apart, which a 40 GiB psum
    matvec nondeterministically triggers. Neither limit exists on real
    chips: the Pallas kernel streams tiles and ICI collectives have no
    such timeout.
  * PROBE leg (N=40960): end-to-end at the largest size that reliably
    stays under the rendezvous skew (threads that reach a psum
    busy-wait and starve the others on one core, so trip probability
    grows with per-device work; 81920 trips it) — the exact
    closed-form matvec check plus the reference's unconverged
    gen-probe contract (`-s N -i 15`) through the full sharded
    while_loop program.

The capacity N maps onto REAL v5e hardware by the budget rule used for
the north-star (BASELINE.md): fq storage at 6 B/element puts each of 8
chips at n*(n+tb)/2*6/8 bytes — printed below — inside 16 GB HBM,
i.e. a v5e-8 slice runs this size with the exact programs proven here.

Run:
    python scripts/stress_scale.py      # ~40 min on the 1-core host
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np

import lam_tpu

lam_tpu.force_platform("cpu")

import jax

from lam_tpu import cg_solve
from lam_tpu.parallel.mesh import make_mesh
from lam_tpu.parallel.pcg_symm import SymmShardedOperator, _geometry

N_CAP = int(os.environ.get("LAM_STRESS_N", 147456))
N_PROBE = int(os.environ.get("LAM_STRESS_PROBE_N", 40960))
TB = 512
G = 8

OUT = os.path.join(os.path.dirname(__file__), "..", "results",
                   "STRESS_SCALE_r03.log")
_lines = []


def emit(s):
    print(s, flush=True)
    _lines.append(s)
    # incremental ATOMIC write (temp + replace): a later-phase abort —
    # the OOM killer or the rendezvous hard-abort documented above can
    # kill this process at any point — must not lose or truncate
    # earlier measured phases
    tmp = OUT + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("# Stress-scale program proof on the 8-shard virtual "
                 "mesh (scripts/stress_scale.py);\n# the reference's "
                 "STRESS_TEST_GPU_MPI.txt analog within one-host "
                 "limits.\n")
        fh.write("\n".join(_lines) + "\n")
    os.replace(tmp, OUT)


def build(n, mesh):
    t0 = time.time()
    op = SymmShardedOperator.from_gen_tridiagonal(n, mesh=mesh,
                                                  packed=True)
    jax.block_until_ready(op.operand)
    t_build = time.time() - t0
    tri_gib = op.operand[0].nbytes / 2**30
    emit(f"N={n} packed-triangle gen build: {t_build:.1f} s, "
         f"padded {op.n_padded}, triangle plane {tri_gib:.1f} GiB f32 "
         f"across {G} shards")
    return op


def check_shard_layout(n, op, mesh):
    """Shard-LOCAL walk-layout validation (no collective — safe at any
    size): tile t of chip c holds block (its[c,t], kts[c,t]) of the
    padded matrix; for the tridiagonal the closed form per tile is
    exact in f32 (diag block: {2,1} band; sub-diagonal block: a single
    1 at (0, tb-1); else zero)."""
    _, tb, _, g, n_p, _, tables, _ = _geometry(n, mesh, None)
    its, kts = np.asarray(tables[0]), np.asarray(tables[1])
    T = its.shape[1]
    tri = op.operand[0]
    checked = 0
    for shard in tri.addressable_shards:
        c = shard.index[0].start // (T * tb)
        block = np.asarray(shard.data)       # (T*tb, tb) f32
        for t in (0, T // 2, T - 1):         # sample tiles per shard
            i, k = int(its[c, t]), int(kts[c, t])
            tile = block[t * tb:(t + 1) * tb]
            expect = np.zeros((tb, tb), np.float32)
            if i == k:
                for r in range(tb):
                    gr = i * tb + r
                    if gr >= n:
                        break
                    expect[r, r] = 2.0
                    if r > 0:
                        expect[r, r - 1] = 1.0
                    if r + 1 < tb and gr + 1 < n:
                        expect[r, r + 1] = 1.0
            elif i == k + 1 and i * tb < n:
                expect[0, tb - 1] = 1.0
            assert np.array_equal(tile, expect), (c, t, i, k)
            checked += 1
    emit(f"  shard-local walk-layout check: exact ({checked} sampled "
         f"tiles across {g} shards)")


def check_matvec(n, op):
    # tridiagonal {2,1} row sums are exactly [3, 4, ..., 4, 3] in f32 —
    # one matvec checks the whole packed walk (tables, mirror,
    # diagonal) at this scale
    ones = op.prepare_b(np.ones((n,), np.float32))
    t0 = time.time()
    y = np.asarray(op.matvec(ones))[:n]
    t_mv = time.time() - t0
    expect = np.full((n,), 4.0, np.float32)
    expect[0] = expect[-1] = 3.0
    assert np.array_equal(y, expect), "closed-form matvec check failed"
    emit(f"  matvec closed-form check: exact ({t_mv:.1f} s incl "
         f"compile on the one-core virtual mesh)")


def main():
    mesh = make_mesh(G)

    emit(f"[capacity leg] N={N_CAP}")
    op = build(N_CAP, mesh)
    check_shard_layout(N_CAP, op, mesh)
    per_chip = N_CAP * (N_CAP + TB) / 2 * 6 / G / 2**30
    emit(f"  v5e-8 budget at this N (fq, 6 B/elem): {per_chip:.2f} "
         f"GiB/chip of 16 — a real 8-chip slice runs this size with "
         f"the programs proven here")
    del op  # free ~41 GiB before the probe leg

    emit(f"[probe leg] N={N_PROBE}")
    op = build(N_PROBE, mesh)
    check_matvec(N_PROBE, op)
    b = np.ones((N_PROBE,), np.float32)
    t0 = time.time()
    res = cg_solve(op, b, max_iters=15, rel_error=1e-9)
    rel = float(res.rel_residual)
    t_probe = time.time() - t0
    assert not bool(res.converged) and int(res.num_iters) == 15
    emit(f"  gen-probe (15 iters): {t_probe:.1f} s, rel_residual "
         f"{rel:.3e} (unconverged by contract)")

    emit("STRESS_SCALE OK")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
