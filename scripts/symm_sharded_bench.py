"""Symmetric band-pair SHARDED solve at N=40000 on the real chip.

Round-2 follow-up to scripts/n70k_readiness.py: the plain sharded
program pays full-matrix reads (3.369 s ir at N=40000); this measures
the triangle-walk sharded operator (lam_tpu/parallel/pcg_symm.py) on
the same system and refreshes the N=70000 projection with the halved
per-chip inner-matvec bytes.

    python scripts/symm_sharded_bench.py [N] | tee -a results/N70K_READINESS.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import lam_tpu  # noqa: F401
    from lam_tpu import cg_solve, cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import (
        SymmShardedOperator,
        band_padded_size,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    seed, tol = 2024, 1e-9
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a = np.load(os.path.join(here, "io", "bench",
                             f"lam_bench_spd_N{n}_s{seed}.npy"))
    b = gen.random_rhs(n, seed=seed + 10)
    bnorm = np.linalg.norm(b)
    print(f"\n== symm band-pair SHARDED solves, N={n}, real chip ==",
          flush=True)

    t0 = time.perf_counter()
    op = SymmShardedOperator.from_row_block_fn(
        lambda s, m: a[s:s + m], n, mesh=make_mesh(1))
    jax.block_until_ready(op.operand[:2])
    print(f"operator built in {time.perf_counter() - t0:.0f} s "
          f"(padded {op.n_padded})", flush=True)
    op32 = op.as_f32()

    def true_rel(x):
        return float(np.linalg.norm(
            b - a @ np.asarray(x, np.float64)) / bnorm)

    def timed(label, fn):
        r = fn(0)
        float(r.rel_residual)
        best, res = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            r = fn(10000)
            float(r.rel_residual)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, res = dt, r
        print(f"  symm-sharded {label:5s} N={n}: {best:7.3f} s  iters "
              f"{int(res.num_iters):4d}  true_rel {true_rel(res.x):.3e}"
              f"  converged {bool(res.converged)}", flush=True)
        return best, res

    ir_s, ir_res = timed("ir", lambda it: cg_solve_ir(
        op32, op, b, max_iters=it, rel_error=tol))
    df_s, _ = timed("df64", lambda it: cg_solve(
        op, b, max_iters=it, rel_error=tol))

    # inner matvec rate (triangle walk: ~half the full-matrix bytes)
    reps = 10
    p32 = op32.prepare_b(b)
    float(jnp.vdot(op32.matvec_chain(p32, reps),
                   op32.matvec_chain(p32, reps)))
    t0 = time.perf_counter()
    out = op32.matvec_chain(p32, reps)
    float(jnp.vdot(out, out))
    inner_ms = (time.perf_counter() - t0) / reps * 1e3
    n_p = op.n_padded
    tri_gb = n_p * (n_p + 512) / 2 * 4 / 1e9  # lower-triangle tiles
    rate = tri_gb / (inner_ms / 1e3)
    print(f"measured symm inner matvec: {inner_ms:.2f} ms "
          f"({tri_gb:.2f} GB triangle -> {rate:.0f} GB/s)")

    for g, label, bw in ((8, "v5e x8", 1.0), (8, "v5p x8",
                                              2765.0 / 819.0)):
        n70p = band_padded_size(70000, g, 512)
        shard_gb = (n70p * n70p / 2 / g) * 4 / 1e9  # triangle/G per chip
        mv_ms = shard_gb / (rate * bw) * 1e3
        iters = int(ir_res.num_iters)
        proj = iters * mv_ms / 1e3 * 1.15  # +15% refinement/psum
        print(f"projected N=70000 symm-sharded ir on {label}: "
              f"~{mv_ms:.2f} ms/inner matvec x {iters} iters ~ "
              f"{proj:.2f} s   [anchor 1.672 s; bar <=1.7 s on v5p-8]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
