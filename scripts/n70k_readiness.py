"""N=70000 readiness artifact (round-1 VERDICT item 4).

The north-star config (N=70000, tol 1e-9; reference anchor: 8x A100
MPI, 1.672 s, TESTS/results/MERGE_GPU_MPI.txt row `70000,8`) needs
39.2 GB of fp64-equivalent matrix — more than the single reachable
v5e's 16 GB HBM. This script produces the substitute evidence the
verdict asked for:

  1. a per-shard HBM budget table for N=70000 across candidate meshes
     (exact padded shapes from the operator's own padding rules);
  2. the LARGEST-N sharded solve that fits the real single chip
     (N=40000, 13.4 GB df64 pair, `ShardedDenseOperator` on a 1-device
     mesh) — proving the sharded code path itself (shard_map program,
     per-shard construction, Pallas kernels, gather comm) runs on TPU
     hardware, not only on the virtual CPU mesh;
  3. an N=70000 per-chip projection derived from the rates MEASURED in
     step 2.

    python scripts/n70k_readiness.py [N]      # default 40000
Output is appended to results/N70K_READINESS.log by the caller:
    python scripts/n70k_readiness.py | tee results/N70K_READINESS.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

N70 = 70000
ITERS70 = 360          # reference iteration count at N=70000


def budget_table():
    """Per-chip HBM budget for N=70000, from the operator's padding."""
    from lam_tpu.ops.gemv import TILE_K, TILE_M
    from lam_tpu.solver.operators import padded_size

    print(f"== N={N70} per-chip HBM budget (df64 pair = 8 B/elem, 1-D "
          f"row shard; padding per ShardedDenseOperator rules) ==")
    print(f"{'mesh':14s} {'padded N':>9s} {'rows/chip':>10s} "
          f"{'pair GB':>8s} {'vec MB':>7s} {'HBM GB':>7s} fit?")
    for name, g, hbm in (("v5e x2", 2, 16), ("v5e x4", 4, 16),
                         ("v5e x8", 8, 16), ("v5p x1", 1, 95),
                         ("v5p x8", 8, 95)):
        mult = max(TILE_K, TILE_M * g)
        n_p = padded_size(N70, mult)
        rows = n_p // g
        pair_gb = 2 * rows * n_p * 4 / 1e9
        # vectors: b,x,r,p,Ap f64 row-sharded + one full-length gather
        # buffer (f32 inner ir / f64 df64 — take f64, the larger)
        vec_mb = (5 * rows * 8 + n_p * 8) / 1e6
        total = pair_gb + vec_mb / 1e3
        fit = "yes" if total < 0.9 * hbm else "NO"
        print(f"{name:14s} {n_p:9d} {rows:10d} {pair_gb:8.2f} "
              f"{vec_mb:7.2f} {total:7.2f} {fit}")
    print()


def main():
    budget_table()

    import jax

    import lam_tpu  # noqa: F401
    from lam_tpu import cg_solve, cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg import ShardedDenseOperator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    seed, tol = 2024, 1e-9
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(here, "io", "bench",
                         f"lam_bench_spd_N{n}_s{seed}.npy")
    print(f"device: {jax.devices()[0]}")
    print(f"loading {cache} ...", flush=True)
    t0 = time.perf_counter()
    a = np.load(cache)
    b = gen.random_rhs(n, seed=seed + 10)
    print(f"loaded in {time.perf_counter() - t0:.0f} s", flush=True)
    bnorm = np.linalg.norm(b)

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    op = ShardedDenseOperator.from_row_block_fn(
        lambda s, m: a[s:s + m], n, mesh=mesh, precision="df64",
        comm="gather")
    jax.block_until_ready(op.operand)
    load_s = time.perf_counter() - t0
    op32 = op.as_f32()
    print(f"sharded operator built on TPU in {load_s:.0f} s "
          f"(pair {2 * op.n_padded * op.n_padded * 4 / 1e9:.1f} GB, "
          f"padded {op.n_padded})", flush=True)

    def true_rel(x):
        return float(np.linalg.norm(
            b - a @ np.asarray(x, np.float64)) / bnorm)

    def timed(label, fn):
        r = fn(0)            # compile
        float(r.rel_residual)
        best, res = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            r = fn(10000)
            float(r.rel_residual)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, res = dt, r
        print(f"  sharded {label:5s} N={n}: {best:7.3f} s  "
              f"iters {int(res.num_iters):4d}  true_rel "
              f"{true_rel(res.x):.3e}  converged {bool(res.converged)}",
              flush=True)
        return best, res

    print(f"\n== sharded solves on the REAL chip (1-device mesh, "
          f"gather comm, tol {tol:g}) ==", flush=True)
    ir_s, ir_res = timed("ir", lambda it: cg_solve_ir(
        op32, op, b, max_iters=it, rel_error=tol))
    df_s, df_res = timed("df64", lambda it: cg_solve(
        op, b, max_iters=it, rel_error=tol))

    # measured per-matvec rates for the projection
    import jax.numpy as jnp
    reps = 10
    p32 = op32.prepare_b(b)
    float(jnp.vdot(op32.matvec_chain(p32, reps),
                   op32.matvec_chain(p32, reps)))  # compile+run
    t0 = time.perf_counter()
    out = op32.matvec_chain(p32, reps)
    float(jnp.vdot(out, out))
    inner_ms = (time.perf_counter() - t0) / reps * 1e3

    n_p = op.n_padded
    inner_gb = n_p * n_p * 4 / 1e9
    rate = inner_gb / (inner_ms / 1e3)
    print(f"\nmeasured inner (f32) sharded matvec: {inner_ms:.2f} ms "
          f"({inner_gb:.2f} GB -> {rate:.0f} GB/s)")

    # N=70000 projection on v5e x8: per-chip inner bytes scale by the
    # shard size; iterations from the ir run here (~365) and the
    # reference's 360; all-gather of p (0.28 MB f32) rides ICI and is
    # negligible against the multi-ms matvec.
    from lam_tpu.solver.operators import padded_size
    from lam_tpu.ops.gemv import TILE_K, TILE_M
    for g, label, bw_scale in ((8, "v5e x8", 1.0), (4, "v5e x4", 1.0),
                               (8, "v5p x8", 2765.0 / 819.0)):
        n70p = padded_size(N70, max(TILE_K, TILE_M * g))
        shard_gb = (n70p // g) * n70p * 4 / 1e9
        mv_ms = shard_gb / (rate * bw_scale) * 1e3
        iters = int(ir_res.num_iters)
        # df64 refinement: ~4 accurate matvecs (2x inner bytes, ~25
        # VPU ops/elem — use the measured df64/inner solve ratio)
        proj = iters * mv_ms / 1e3 * 1.10  # +10% refinement/dots
        note = (" (spec-bandwidth-scaled)" if bw_scale != 1.0 else "")
        print(f"projected N={N70} ir on {label}{note}: ~{mv_ms:.2f} "
              f"ms/inner matvec x {iters} iters (+10% refinement) ~ "
              f"{proj:.2f} s   [anchor: 8x A100 MPI 1.672 s; "
              f"north-star bar <=1.7 s on v5p-8]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
