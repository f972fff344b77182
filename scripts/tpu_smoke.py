"""TPU hardware smoke test: the checks that CANNOT run on the CPU suite.

XLA:CPU evaluates fused f32 regions in excess precision, which silently
disables the float-float compensation (see tests/test_kernels.py), so the
strict df64 accuracy claims are verified here, on the real chip, where
Mosaic preserves the error-free transforms. Run:

    cd /root/repo && python scripts/tpu_smoke.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    import lam_tpu  # noqa: F401
    from lam_tpu import DenseOperator, cg_solve, cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.ops.gemv import gemv_df64, gemv_f32
    from lam_tpu.precision import split_f64

    assert jax.default_backend() == "tpu", (
        f"this smoke test needs a TPU, got {jax.default_backend()}")
    print("device:", jax.devices()[0])

    # 1. df64 gemv is exactly-rounded-class accurate on hardware
    rng = np.random.default_rng(0)
    m, n = 1024, 2048
    a = rng.uniform(-1, 1, (m, n))
    p = rng.uniform(-1, 1, n)
    ah, al = split_f64(a)
    ph, pl = split_f64(p)
    yh, yl = gemv_df64(ah, al, ph, pl)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    err = np.linalg.norm(y - a @ p) / np.linalg.norm(a @ p)
    print(f"df64 gemv rel L2 error: {err:.2e}")
    assert err < 1e-13, "compensated arithmetic broken on this backend"

    # 2. full df64 solve reaches a TRUE 1e-9 residual
    n = 2048
    a, b = gen.random_spd_system(n, seed=7)
    op = DenseOperator.from_dense(a, precision="df64")
    t0 = time.perf_counter()
    res = cg_solve(op, b, max_iters=5000, rel_error=1e-9)
    rel = float(res.rel_residual)
    dt = time.perf_counter() - t0
    x = np.asarray(res.x)
    true_rel = np.linalg.norm(b - a @ x) / np.linalg.norm(b)
    print(f"df64 solve: {int(res.num_iters)} iters, recurrence {rel:.2e}, "
          f"TRUE {true_rel:.2e}, {dt:.2f}s (incl. compile)")
    assert bool(res.converged) and true_rel < 5e-9

    # 3. mixed-precision refinement reaches the same quality
    res_ir = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                         rel_error=1e-9)
    x = np.asarray(res_ir.x)
    true_rel = np.linalg.norm(b - a @ x) / np.linalg.norm(b)
    print(f"ir solve: {int(res_ir.num_iters)} inner iters, "
          f"TRUE {true_rel:.2e}")
    assert bool(res_ir.converged) and true_rel < 5e-9

    # 4. f32 kernel sanity
    y32 = np.asarray(gemv_f32(ah, ph))
    assert np.isfinite(y32).all()

    # (An FMA-contraction product shortcut was removed 2026-08-16: Mosaic
    # on v5e does not contract a*b - round(a*b), so its error term was 0
    # and a full solve's TRUE residual silently degraded to 2.3e-7.)

    # 5. symmetric lower-triangle kernel: f32-accuracy agreement with the
    # full product on a symmetric matrix (compiled Mosaic path)
    from lam_tpu.ops.gemv import gemv_f32_symm
    rng = np.random.default_rng(4)
    ns = 1024
    ms = rng.uniform(-1, 1, (ns, ns))
    a_s = (ms + ms.T).astype(np.float32)
    p_s = rng.uniform(-1, 1, ns).astype(np.float32)
    y_s = np.asarray(gemv_f32_symm(a_s, p_s))
    ref_s = a_s.astype(np.float64) @ p_s.astype(np.float64)
    err_s = np.linalg.norm(y_s - ref_s) / np.linalg.norm(ref_s)
    print(f"symm f32 gemv rel L2 error: {err_s:.2e}")
    assert err_s < 1e-5

    # 6. column-block kernel (ring matvec building block), nonzero block
    from lam_tpu.ops.gemv import gemv_f32_cols
    y_c = np.asarray(gemv_f32_cols(a_s, p_s[512:], 1, tile_k=512))
    ref_c = a_s[:, 512:].astype(np.float64) @ p_s[512:].astype(np.float64)
    err_c = np.linalg.norm(y_c - ref_c) / max(np.linalg.norm(ref_c), 1e-30)
    print(f"column-block f32 gemv rel L2 error: {err_c:.2e}")
    assert err_c < 1e-5

    # 7. the sharded program compiles and runs on the real backend
    # (1-device mesh — collectives are trivial but the shard_map path,
    # per-shard construction, and Pallas kernels all execute compiled)
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg import ShardedDenseOperator
    sop = ShardedDenseOperator.from_dense(a, mesh=make_mesh(1),
                                          precision="df64")
    sres = cg_solve(sop, b, max_iters=5000, rel_error=1e-9)
    x_s = np.asarray(sres.x)
    true_s = np.linalg.norm(b - a @ x_s) / np.linalg.norm(b)
    print(f"sharded (1-chip mesh) solve: {int(sres.num_iters)} iters, "
          f"TRUE {true_s:.2e}")
    assert bool(sres.converged) and true_s < 5e-9

    # 8. df64 compensation budgets: the default 'nolow' (drops the
    # 2^-48-order al*plo term) must stay exactly-rounded-class on REAL
    # Mosaic, where the CPU suite cannot see compensation bugs (excess
    # precision). (A Kahan-fold 'fast' budget was rejected here: solve
    # true residual degraded to 2.2e-7, scripts/df64_tune.py 2026-08-16.)
    rng = np.random.default_rng(1)
    a8 = rng.uniform(-1, 1, (1024, 2048))
    p8 = rng.uniform(-1, 1, 2048)
    a8h, a8l = split_f64(a8)
    p8h, p8l = split_f64(p8)
    ref8 = a8 @ p8
    for comp in ("full", "nolow"):
        yh, yl = gemv_df64(a8h, a8l, p8h, p8l, comp=comp)
        y8 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        e8 = np.linalg.norm(y8 - ref8) / np.linalg.norm(ref8)
        print(f"df64 gemv comp={comp}: rel L2 error {e8:.2e}")
        assert e8 < 1e-13, comp

    # 8b. symmetric df64 kernel: triangle reads must keep the
    # exactly-rounded-class accuracy of the full kernel on real Mosaic
    from lam_tpu.ops.gemv import gemv_df64_symm
    a_sym = a8[:1024, :1024] + a8[:1024, :1024].T
    ash, asl = split_f64(a_sym)
    psh, psl = split_f64(p8[:1024])
    ref_sym = a_sym @ p8[:1024]
    for comp in ("full", "nolow"):
        yh, yl = gemv_df64_symm(ash, asl, psh, psl, comp=comp)
        y9 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        e9 = np.linalg.norm(y9 - ref_sym) / np.linalg.norm(ref_sym)
        print(f"df64 SYMM gemv comp={comp}: rel L2 error {e9:.2e}")
        assert e9 < 1e-13, comp

    # 9. Jacobi-PCG through the sharded program on the real backend
    psres = sop.run_pcg(sop.prepare_b(b), 5000, 1e-9)
    x_p = np.asarray(psres.x)[:n]
    true_p = np.linalg.norm(b - a @ x_p) / np.linalg.norm(b)
    print(f"sharded jacobi-PCG solve: {int(psres.num_iters)} iters, "
          f"TRUE {true_p:.2e}")
    assert bool(psres.converged) and true_p < 5e-9

    # 10. Pallas 5-point stencil (heat demo inner kernel) on hardware
    import jax.numpy as jnp

    from lam_tpu.ops.stencil import laplace5_f32, padded_hw
    nyi, nxi = 300, 250
    H, W, tbr = padded_hw(nyi, nxi)
    ps = np.zeros((H, W), np.float32)
    ps[:nyi, :nxi] = rng.standard_normal((nyi, nxi)).astype(np.float32)
    ys, ds = laplace5_f32(jnp.asarray(ps), nyi=nyi, nxi=nxi, tbr=tbr)
    ys = np.asarray(ys)
    gs = ps.astype(np.float64)[:nyi, :nxi]
    refs = 4 * gs.copy()
    refs[1:, :] -= gs[:-1, :]
    refs[:-1, :] -= gs[1:, :]
    refs[:, 1:] -= gs[:, :-1]
    refs[:, :-1] -= gs[:, 1:]
    es = np.abs(ys[:nyi, :nxi] - refs).max()
    dref = float((gs * refs).sum())
    pad_zero = (ys[nyi:] == 0).all() and (ys[:, nxi:] == 0).all()
    print(f"pallas stencil: max err {es:.2e}, fused-dot rel "
          f"{abs(float(ds) - dref) / abs(dref):.2e}, "
          f"pad_zero={bool(pad_zero)}")
    assert es < 1e-4 and pad_zero
    assert abs(float(ds) - dref) <= 1e-5 * abs(dref)

    print("TPU smoke: ALL PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
