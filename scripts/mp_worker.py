"""Multi-process CG worker — one per simulated 'node'.

Used by __graft_entry__.dryrun_multichip's multi-process leg and by
tests/test_multiprocess.py: bootstraps jax.distributed against a local
coordinator (the rebuild's answer to the reference's MPI_Init + NCCL
unique-id broadcast, ConjugateGradient_MultiGPUS_CUDA_NCCL.cu:309-327),
builds the GLOBAL device mesh, and runs converged sharded CG solves
(gather AND ring comm) with per-process shard construction. Every
process verifies the TRUE residual host-side after a cross-process
gather of the solution; rank 0 prints one "MP_OK ..." line per comm
strategy for the caller to check.

Launch one worker per process:
    python scripts/mp_worker.py --coordinator 127.0.0.1:PORT \
        --num-processes 2 --process-id I --local-devices 4 [-n 512]
"""

import os
import re
import sys


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("-n", type=int, default=512)
    args = ap.parse_args(argv)

    # our per-process device count must win over any inherited flag
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count="
        f"{args.local_devices}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    import lam_tpu  # enables x64
    lam_tpu.force_platform("cpu")

    from lam_tpu.parallel.mesh import distributed_init, make_mesh
    distributed_init(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.local_devices()) == args.local_devices

    import numpy as np

    from lam_tpu import cg_solve
    from lam_tpu import generate as gen
    from lam_tpu.parallel.pcg import ShardedDenseOperator
    from lam_tpu.solver.api import _host_array

    n = args.n
    a, b = gen.random_spd_system(n, seed=2024)
    bnorm = np.linalg.norm(b)
    mesh = make_mesh()  # ALL global devices, across processes

    def check(res, label):
        x = _host_array(res.x)          # cross-process allgather
        true_rel = float(np.linalg.norm(b - a @ x) / bnorm)
        assert bool(res.converged), f"{label}: did not converge"
        assert true_rel < 1e-8, f"{label}: true residual {true_rel}"
        if jax.process_index() == 0:
            print(f"MP_OK comm={label} procs={args.num_processes} "
                  f"devices={mesh.devices.size} "
                  f"iters={int(res.num_iters)} true_rel={true_rel:.3e}",
                  flush=True)

    for comm in ("gather", "ring"):
        op = ShardedDenseOperator.from_dense(a, mesh=mesh,
                                             precision="f64", comm=comm)
        check(cg_solve(op, b, max_iters=2000, rel_error=1e-9), comm)

    # symmetric band-pair operator: per-process slab construction,
    # replicated vectors, cross-process psum in the matvec
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    sop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128)
    check(cg_solve(sop, b, max_iters=2000, rel_error=1e-9), "symm")

    # packed-triangle variant: per-process construction of the walk-
    # order tile buffer (half the stored bytes; round 3)
    pop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128,
                                         packed=True)
    check(cg_solve(pop, b, max_iters=2000, rel_error=1e-9),
          "symm-packed")

    # quantized-lo (dfq) variant: per-process quantized pack (6 B/elem
    # per shard) with the slab-order diagonal pair — each process packs
    # only the chips it addresses (callback placement; round 3)
    qop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128,
                                         precision="dfq")
    check(cg_solve(qop, b, max_iters=2000, rel_error=1e-9),
          "symm-dfq")

    # fully-quantized (fq) variant: per-process triple-int16 pack, the
    # inner-loop view reading only the 2-byte q1 plane (round 3b)
    fop = SymmShardedOperator.from_dense(a, mesh=mesh, tb=128,
                                         precision="fq")
    check(cg_solve(fop, b, max_iters=2000, rel_error=1e-9),
          "symm-fq")

    # 2-D (SUMMA) grid spanning BOTH processes: pick two devices from
    # each so the transpose ppermute and the cols-psum cross the
    # process boundary (round 3; the in-process dryrun leg already
    # covers the single-process grid)
    if args.num_processes == 2 and args.local_devices >= 2:
        from lam_tpu.parallel.pcg2d import AXES, Sharded2DOperator
        devs = jax.devices()
        per = args.local_devices
        sel = np.array(devs[:2] + devs[per:per + 2]).reshape(2, 2)
        mesh2 = jax.sharding.Mesh(sel, AXES)
        op2 = Sharded2DOperator.from_dense(a, mesh=mesh2,
                                           precision="f64")
        check(cg_solve(op2, b, max_iters=2000, rel_error=1e-9), "2d")

        # symmetric 2-D grid with fully-quantized storage (round 3c):
        # per-process quantized packs (callback placement) and the
        # dual q16/fq kernels' collectives — 2 transpose ppermutes +
        # the cols-psum — crossing the process boundary
        from lam_tpu.parallel.pcg2d_symm import Symm2DOperator
        fop2 = Symm2DOperator.from_dense(a, mesh=mesh2, tb=128,
                                         precision="fq")
        check(cg_solve(fop2, b, max_iters=2000, rel_error=1e-9),
              "sym2d-fq")
        # device-built gen-mode fq plane across processes (each
        # process materializes only its own chips' shards)
        gop2 = Symm2DOperator.from_gen_fq(256, mesh=mesh2, tb=128)
        at = gen.tridiagonal_matrix(256)
        pg = gen.random_rhs(256, seed=4)
        apg = _host_array(gop2.matvec(gop2.prepare_b(pg)))[:256]
        gerr = float(np.abs(apg - np.asarray(at) @ pg).max())
        assert gerr < 1e-9, f"sym2d gen-fq MP mismatch: {gerr}"
        if jax.process_index() == 0:
            print(f"MP_OK comm=sym2d-genfq procs={args.num_processes} "
                  f"devices={mesh2.devices.size} err={gerr:.3e}",
                  flush=True)

    # heat demo: row-sharded halo-exchange stencil with CROSS-PROCESS
    # ppermute of the boundary rows (the matrix-free parallel pattern)
    from lam_tpu.apps import heat
    g0 = heat.initial_grid(40, 36)
    ref_grid, _, _ = heat.solve_heat_cg(g0, precision="f64",
                                        rel_error=1e-11)
    out, _, rel = heat.solve_heat_cg(g0, devices=mesh.devices.size,
                                     rel_error=1e-11)
    assert rel < 1e-11, f"heat: rel {rel}"
    dmax = float(np.abs(out - ref_grid).max())
    assert dmax < 1e-6, f"heat: mismatch {dmax}"
    if jax.process_index() == 0:
        print(f"MP_OK comm=heat-halo procs={args.num_processes} "
              f"devices={mesh.devices.size} rel={rel:.3e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
