"""Real-TPU hardware gate: `pytest -m tpu` (round 3; VERDICT.md item 8).

These assertions CANNOT run on the CPU suite: XLA:CPU evaluates fused
f32 regions in excess precision, silently repairing broken float-float
compensation — so the strict df64 accuracy claims are only meaningful
on compiled Mosaic (docs/REPORT.md §3). Previously they lived in
scripts/tpu_smoke.py runs logged to results/TPU_SMOKE_*.log; as pytest
tests a regression now FAILS a test run instead of only dirtying a log.

The default suite skips these (tests/conftest.py forces the CPU
backend); `pytest -m tpu` leaves the ambient TPU platform in place and
runs only this module's tests.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="session")
def tpu_backend():
    import jax

    import lam_tpu  # noqa: F401  (x64 on)
    if jax.default_backend() != "tpu":
        pytest.skip(f"needs a real TPU, got {jax.default_backend()}")
    return jax


@pytest.fixture(scope="session")
def spd_system(tpu_backend):
    from lam_tpu import generate as gen
    a, b = gen.random_spd_system(2048, seed=7)
    return a, b


def _rel(y, ref):
    return np.linalg.norm(y - ref) / np.linalg.norm(ref)


def test_df64_gemv_exactly_rounded_class(tpu_backend):
    # hardware EFT: Dekker two_prod + Knuth two_sum must survive Mosaic
    # compilation (the FMA-contraction and Kahan-fold shortcuts both
    # silently degraded true residuals to ~2e-7; docs/REPORT.md)
    from lam_tpu.ops.gemv import gemv_df64
    from lam_tpu.precision import split_f64
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (1024, 2048))
    p = rng.uniform(-1, 1, 2048)
    ah, al = split_f64(a)
    ph, pl = split_f64(p)
    for comp in ("full", "nolow"):
        yh, yl = gemv_df64(ah, al, ph, pl, comp=comp)
        y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        assert _rel(y, a @ p) < 1e-13, comp


def test_df64_symm_gemv_full_and_packed(tpu_backend):
    from lam_tpu.ops.gemv import gemv_df64_symm, pack_tri_host
    from lam_tpu.precision import split_f64
    rng = np.random.default_rng(1)
    m = rng.uniform(-1, 1, (1024, 1024))
    a = m + m.T
    p = rng.uniform(-1, 1, 1024)
    ah, al = split_f64(a)
    ph, pl = split_f64(p)
    ref = a @ p
    for comp in ("full", "nolow"):
        yh, yl = gemv_df64_symm(ah, al, ph, pl, comp=comp)
        y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        assert _rel(y, ref) < 1e-13, comp
    # packed triangle storage must be BIT-identical to the full walk
    tb = 512
    hp = pack_tri_host(ah, tb)
    lp = pack_tri_host(al, tb)
    yh_f, yl_f = gemv_df64_symm(ah, al, ph, pl, tb=tb)
    yh_p, yl_p = gemv_df64_symm(hp, lp, ph, pl, packed=True)
    np.testing.assert_array_equal(np.asarray(yh_f), np.asarray(yh_p))
    np.testing.assert_array_equal(np.asarray(yl_f), np.asarray(yl_p))


def test_f32_symm_and_column_block_kernels(tpu_backend):
    from lam_tpu.ops.gemv import gemv_f32_cols, gemv_f32_symm
    rng = np.random.default_rng(4)
    m = rng.uniform(-1, 1, (1024, 1024))
    a = (m + m.T).astype(np.float32)
    p = rng.uniform(-1, 1, 1024).astype(np.float32)
    ref = a.astype(np.float64) @ p.astype(np.float64)
    assert _rel(np.asarray(gemv_f32_symm(a, p)), ref) < 1e-5
    y_c = np.asarray(gemv_f32_cols(a, p[512:], 1, tile_k=512))
    ref_c = a[:, 512:].astype(np.float64) @ p[512:].astype(np.float64)
    assert _rel(y_c, ref_c) < 1e-5


def test_df64_solve_true_residual(tpu_backend, spd_system):
    from lam_tpu import DenseOperator, cg_solve
    a, b = spd_system
    op = DenseOperator.from_dense(a, precision="df64")
    assert op.engine == "pallas_symm_packed"  # TPU auto default
    res = cg_solve(op, b, max_iters=5000, rel_error=1e-9)
    x = np.asarray(res.x)
    assert bool(res.converged)
    true_rel = np.linalg.norm(b - a @ x) / np.linalg.norm(b)
    assert true_rel < 5e-9


def test_ir_solve_true_residual(tpu_backend, spd_system):
    from lam_tpu import DenseOperator, cg_solve_ir
    a, b = spd_system
    op = DenseOperator.from_dense(a, precision="df64")
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                      rel_error=1e-9)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 5e-9


def test_sharded_packed_mesh_solve(tpu_backend, spd_system):
    # 1-device mesh: collectives are trivial but the shard_map path,
    # per-shard packed construction, and compiled Pallas slab kernels
    # all execute on hardware
    from lam_tpu import cg_solve
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    a, b = spd_system
    op = SymmShardedOperator.from_dense(a, mesh=make_mesh(1),
                                        packed=True)
    res = cg_solve(op, b, max_iters=5000, rel_error=1e-9)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 5e-9


def test_dual_kernels_hardware_accuracy(tpu_backend):
    # the SYMMETRIC 2-D grid's off-diagonal building block
    # (lam_tpu/parallel/pcg2d_symm.py): both products of one half-slab
    # read, with the same EFT guarantees as the symm kernels
    from lam_tpu.ops.gemv import (gemv_df64_dual, gemv_f32_dual,
                                  pack_rect_host)
    from lam_tpu.precision import split_f64
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    ms, n = 512, 1024
    s = rng.uniform(-1, 1, (ms, n))
    p = rng.uniform(-1, 1, n)
    q = rng.uniform(-1, 1, ms)
    tb = 512
    # f32
    b32 = pack_rect_host(s.astype(np.float32), tb, pad_tiles=1)
    d, t = gemv_f32_dual(jnp.asarray(b32),
                         jnp.asarray(p, jnp.float32),
                         jnp.asarray(q, jnp.float32))
    assert _rel(np.asarray(d, np.float64), s @ p) < 1e-5
    assert _rel(np.asarray(t, np.float64), s.T @ q) < 1e-5
    # df64: f64-quality for BOTH products from one pass
    sh, sl = split_f64(s)
    bh = pack_rect_host(np.asarray(sh), tb, pad_tiles=1)
    bl = pack_rect_host(np.asarray(sl), tb, pad_tiles=1)
    ph, pl = split_f64(p)
    qh, ql = split_f64(q)
    dh, dl, th, tl = gemv_df64_dual(jnp.asarray(bh), jnp.asarray(bl),
                                    ph, pl, qh, ql)
    d64 = np.asarray(dh, np.float64) + np.asarray(dl, np.float64)
    t64 = np.asarray(th, np.float64) + np.asarray(tl, np.float64)
    assert _rel(d64, s @ p) < 1e-13
    assert _rel(t64, s.T @ q) < 1e-13
    # broadcast zero lo tile (gen-mode quarter-capacity form)
    zl = jnp.zeros((tb, tb), jnp.float32)
    s32 = np.asarray(sh, np.float64)
    dh2, dl2, th2, tl2 = gemv_df64_dual(jnp.asarray(bh), zl, ph, pl,
                                        qh, ql)
    d2 = np.asarray(dh2, np.float64) + np.asarray(dl2, np.float64)
    assert _rel(d2, s32 @ p) < 1e-13


def test_dfq_quantized_storage_hardware_accuracy(tpu_backend, spd_system):
    # the 6-byte element (f32 hi + int16 quantized lo + extracted df64
    # diagonal, lam_tpu/solver/operators.py from_dense_dfq): on compiled
    # Mosaic the matvec must sit at the QUANTIZATION bound (~1e-12
    # relative), far below f32 (2e-7) — and iterative refinement against
    # it must still land true 1e-9 residuals. This storage is what fits
    # the N=70000 north-star (SURVEY.md §6) on one 16 GB chip.
    from lam_tpu import DenseOperator, cg_solve_ir
    a, b = spd_system
    op = DenseOperator.from_dense(a, precision="dfq")
    rng = np.random.default_rng(11)
    p = rng.uniform(-1, 1, a.shape[0])
    y = np.asarray(op.extract_x(op.matvec(op.prepare_b(p))))
    assert _rel(y, a @ p) < 5e-11
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000, rel_error=1e-9)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_sharded_dfq_slab_kernel_hardware_accuracy(tpu_backend,
                                                   spd_system):
    # compiled gemv_dfq_symm_slab (band-pair quantized-lo storage,
    # round 3): on a 1-device mesh the shard_map wrapping is trivial
    # but the slab walk, in-VMEM dequantization, and diagonal df64 pair
    # all execute on hardware. Matvec at the quantization bound; irq
    # refinement lands a true 1e-9 residual.
    from lam_tpu import cg_solve_ir
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    a, b = spd_system
    n = a.shape[0]
    op = SymmShardedOperator.from_dense(a, mesh=make_mesh(1),
                                        precision="dfq")
    rng = np.random.default_rng(13)
    p = rng.uniform(-1, 1, n)
    y = np.asarray(op.matvec(op.prepare_b(p)))[:n]
    assert _rel(y, a @ p) < 5e-11
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                      rel_error=1e-9)
    x = np.asarray(res.x)[:n]
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_sym2d_dfq_hardware_accuracy(tpu_backend, spd_system):
    # compiled dual dfq kernels (gemv_dfq_dual) + the quantized packed
    # triangle on the diagonal chips, on a 1x1 grid mesh: trivial
    # collectives, real Mosaic kernels. Matvec at the quantization
    # bound; irq refinement lands a true 1e-9 residual.
    from lam_tpu import cg_solve_ir
    from lam_tpu.parallel.pcg2d import make_mesh2d
    from lam_tpu.parallel.pcg2d_symm import Symm2DOperator
    a, b = spd_system
    n = a.shape[0]
    op = Symm2DOperator.from_dense(a, mesh=make_mesh2d(1),
                                   precision="dfq")
    rng = np.random.default_rng(17)
    p = rng.uniform(-1, 1, n)
    y = np.asarray(op.matvec(op.prepare_b(p)))[:n]
    assert _rel(y, a @ p) < 5e-11
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                      rel_error=1e-9)
    x = np.asarray(res.x)[:n]
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_fq_fully_quantized_storage_hardware_accuracy(tpu_backend,
                                                      spd_system):
    # the fully-quantized 6-byte element (three int16 planes against
    # per-tile power-of-two scales + extracted df64 diagonal,
    # lam_tpu/solver/operators.py from_dense_fq): on compiled Mosaic the
    # in-kernel two_sum rebuild of (ah, al) must hold the storage bound
    # (~2^-48 tile-relative -> ~1e-13 matvec), and refinement against it
    # with the 2-byte q16 INNER plane (gemv_q16_symm — half the ir/irq
    # inner HBM bytes) must still land true 1e-9 residuals.
    from lam_tpu import DenseOperator, cg_solve_ir
    a, b = spd_system
    op = DenseOperator.from_dense(a, precision="fq")
    rng = np.random.default_rng(12)
    p = rng.uniform(-1, 1, a.shape[0])
    y = np.asarray(op.extract_x(op.matvec(op.prepare_b(p))))
    assert _rel(y, a @ p) < 1e-12
    # the inner view reads only the q1 plane: ~2^-16 tile-relative.
    # (At this n < Q16_MXU_MIN_N the q16 products are exact-f32 VPU;
    # above the threshold the MXU engine adds ~2^-9 bf16 rounding —
    # covered end-to-end by scripts/q16_e2e.py, Q16_E2E_r04.log.)
    op32 = op.as_f32()
    y32 = np.asarray(op32.extract_x(op32.matvec(
        op32.prepare_b(p.astype(np.float32)))), np.float64)
    assert _rel(y32, a @ p) < 1e-3
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                      rel_error=1e-9, inner_floor=1e-2)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_sharded_fq_slab_kernels_hardware_accuracy(tpu_backend,
                                                   spd_system):
    # 1-device mesh: the fq slab kernels (gemv_q16_symm_slab /
    # gemv_fq_symm_slab) compile on real Mosaic (interpret mode accepts
    # shapes hardware rejects — the dfq (1,1)-block lesson) and the
    # irfq refinement lands true 1e-9 residuals through the sharded
    # program.
    from lam_tpu import cg_solve, cg_solve_ir
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    a, b = spd_system
    op = SymmShardedOperator.from_dense(a, mesh=make_mesh(1),
                                        precision="fq")
    res = cg_solve(op, b, max_iters=5000, rel_error=1e-9)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9
    res2 = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                       rel_error=1e-9, inner_floor=1e-2)
    x2 = np.asarray(res2.x)
    assert bool(res2.converged)
    assert np.linalg.norm(b - a @ x2) / np.linalg.norm(b) < 2e-9


def test_sym2d_fq_hardware_accuracy(tpu_backend, spd_system):
    # fq on the 2-D grid, 1x1 mesh: lax.switch compiles ALL branches,
    # so the dual fq kernels (gemv_fq_dual / gemv_q16_dual) must pass
    # Mosaic lowering even though only the diagonal branch executes;
    # the executed path checks the ~2^-48 storage bound and irfq lands
    # a true 1e-9 residual through the grid program.
    from lam_tpu import cg_solve_ir
    from lam_tpu.parallel.pcg2d import make_mesh2d
    from lam_tpu.parallel.pcg2d_symm import Symm2DOperator
    a, b = spd_system
    n = a.shape[0]
    op = Symm2DOperator.from_dense(a, mesh=make_mesh2d(1),
                                   precision="fq")
    rng = np.random.default_rng(18)
    p = rng.uniform(-1, 1, n)
    y = np.asarray(op.matvec(op.prepare_b(p)))[:n]
    assert _rel(y, a @ p) < 1e-12
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000,
                      rel_error=1e-9, inner_floor=1e-2)
    x = np.asarray(res.x)[:n]
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_gen_fq_device_built_hardware(tpu_backend):
    # device-built gen-mode fq (DenseOperator.from_gen_fq): the q1
    # plane is quantization-EXACT ({0,1} against the 2^-14 scale) and
    # the broadcast zero q2/q3 tiles ride block-0-pinned index maps —
    # Mosaic must lower that BlockSpec shape, and the accurate cascade
    # matvec must reconstruct the tridiagonal to df64 accuracy on
    # compiled hardware; irfq against it lands a true 1e-9 residual.
    import jax
    import jax.numpy as jnp

    from lam_tpu import cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.ops.gemv import SYMM_TB, _symm_tables
    from lam_tpu.solver.operators import DenseOperator, padded_size
    n = 4000
    tb = SYMM_TB
    n_p = padded_size(n, tb)
    it, kt = _symm_tables(n_p // tb)
    q1 = jax.jit(gen._tridiag_q1_packed_impl,
                 static_argnums=(0, 1, 4))(n, tb, jnp.asarray(it),
                                           jnp.asarray(kt), n_p // tb)
    op = DenseOperator.from_gen_fq(q1, n, n_p)
    a = gen.tridiagonal_rows(0, n, n)
    rng = np.random.default_rng(5)
    p = rng.uniform(-1, 1, n)
    y = np.asarray(op.extract_x(op.matvec(op.prepare_b(p))))
    assert _rel(y, a @ p) < 1e-12
    b = gen.ones_rhs(n)
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=20000,
                      rel_error=1e-9, inner_floor=1e-2)
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_sharded_gen_fq_device_built_hardware(tpu_backend):
    # sharded gen-mode fq on a 1-device mesh: the slab fq kernel must
    # lower the broadcast zero-residual-tile BlockSpecs on Mosaic, the
    # accurate cascade matvec must hit the gen tridiagonal at df64
    # accuracy, and irfq through the sharded program lands true 1e-9.
    from lam_tpu import cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    n = 4000
    op = SymmShardedOperator.from_gen_fq(n, mesh=make_mesh(1))
    a = gen.tridiagonal_rows(0, n, n)
    rng = np.random.default_rng(6)
    p = rng.uniform(-1, 1, n)
    y = np.asarray(op.matvec(op.prepare_b(p)))[:n]
    assert _rel(y, a @ p) < 1e-12
    b = gen.ones_rhs(n)
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=20000,
                      rel_error=1e-9, inner_floor=1e-2)
    assert bool(res.converged)
    x = np.asarray(res.x)[:n]
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_sym2d_gen_fq_device_built_hardware(tpu_backend):
    # device-built gen-mode fq on the 2-D grid, 1x1 mesh: lax.switch
    # compiles ALL branches, so gemv_fq_dual with BROADCAST zero
    # residual tiles (the a_map0 BlockSpecs) must pass Mosaic lowering
    # even though only the diagonal branch executes; the executed path
    # must hit the gen tridiagonal exactly (quantization-EXACT q1
    # plane) and irfq lands a true 1e-9 residual through the grid.
    from lam_tpu import cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.parallel.pcg2d import make_mesh2d
    from lam_tpu.parallel.pcg2d_symm import Symm2DOperator
    n = 4000
    op = Symm2DOperator.from_gen_fq(n, mesh=make_mesh2d(1))
    a = gen.tridiagonal_rows(0, n, n)
    rng = np.random.default_rng(13)
    p = rng.uniform(-1, 1, n)
    y = np.asarray(op.matvec(op.prepare_b(p)))[:n]
    assert _rel(y, a @ p) < 1e-12
    b = gen.ones_rhs(n)
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=20000,
                      rel_error=1e-9, inner_floor=1e-2)
    assert bool(res.converged)
    x = np.asarray(res.x)[:n]
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_sharded_pack_cache_roundtrip_hardware(tpu_backend, tmp_path):
    """Per-shard pack cache on the real chip (round 4): a sharded fq
    load publishes shard files, the reload is served from them
    bitwise-identically, and the cached operator solves to a TRUE
    1e-9 residual through the Pallas slab kernels."""
    from lam_tpu import ConjugateGradient
    from lam_tpu import generate as gen
    from lam_tpu import io as lio
    from lam_tpu.solver import pack_cache as pc

    n = 2048
    a, b = gen.random_spd_system(n, seed=17)
    path = str(tmp_path / "m.bin")
    lio.write_matrix(path, a)

    cg = ConjugateGradient(backend="sharded", precision="irfq",
                           pack_cache=True)
    assert cg.load_matrix_from_file(path)
    g = cg.op.mesh.shape[cg.op.axis]
    assert os.path.exists(pc.shard_cache_path(path, "fq", "g", g, 0))
    ref_bufs = [np.asarray(x) for x in cg.op.operand]

    cg2 = ConjugateGradient(backend="sharded", precision="irfq",
                            pack_cache=True)
    assert cg2.load_matrix_from_file(path)
    for i, (x, y) in enumerate(zip(cg2.op.operand, ref_bufs)):
        np.testing.assert_array_equal(np.asarray(x), y,
                                      err_msg=f"operand[{i}]")
    cg2.rhs = b
    assert cg2.solve(max_iters=10000, rel_error=1e-9)
    x = np.asarray(cg2.x, np.float64)[:n]
    assert np.linalg.norm(b - a @ x) / np.linalg.norm(b) < 2e-9


def test_q16_mxu_slab_and_dual_kernels_hardware_exact(tpu_backend):
    """Above Q16_MXU_MIN_N the sharded q16 kernels run their per-tile
    products on the MXU (single-pass bf16 dots, LAM_Q16_IMPL=auto —
    results/Q16_PROBE4_r04.log). With small-integer tiles, power-of-two
    scales and small-integer operands every product is exact in bf16
    and the f32 MXU accumulator is exact, so the MXU path must match
    the numpy oracle BITWISE; any routing/index-map error in the
    row-operand views would show up as a wrong value, not noise."""
    import jax.numpy as jnp

    from lam_tpu.ops import gemv
    from lam_tpu.ops.gemv import Q16_MXU_MIN_N, _symm_tables

    tb = 512
    n = Q16_MXU_MIN_N
    assert gemv._q16_impl(n) == "mxu"
    nblk = n // tb
    rng = np.random.default_rng(41)

    # symmetric slab identity: full-triangle walk tables with lt=it and
    # ms=n make the slab kernel compute the whole symmetric matvec
    it, kt = _symm_tables(nblk)
    T = len(it)
    q1 = rng.integers(-3, 4, (T * tb, tb)).astype(np.int16)
    s1 = np.full((T,), 0.5, np.float32)
    p = rng.integers(-3, 4, n).astype(np.float32)
    yd, yt = gemv.gemv_q16_symm_slab(
        jnp.asarray(q1), jnp.asarray(s1), jnp.asarray(p),
        np.asarray(it), np.asarray(kt), np.asarray(it), ms=n)
    y = np.asarray(yd, np.float64) + np.asarray(yt, np.float64)
    ref = np.zeros(n)
    for t, (i, k) in enumerate(zip(it, kt)):
        tile = q1[t * tb:(t + 1) * tb].astype(np.float64) * 0.5
        ref[i * tb:(i + 1) * tb] += tile @ p[k * tb:(k + 1) * tb]
        if k < i:
            ref[k * tb:(k + 1) * tb] += tile.T @ p[i * tb:(i + 1) * tb]
    np.testing.assert_array_equal(y, ref)

    # dual rectangle: (S @ p, S^T @ q) through the MXU row-operand views
    ms = 2 * tb
    mb, cb = ms // tb, nblk
    q1buf = rng.integers(-3, 4, (mb * cb * tb, tb)).astype(np.int16)
    sc = np.full((mb * cb,), 0.25, np.float32)
    qv = rng.integers(-3, 4, ms).astype(np.float32)
    yd, yt = gemv.gemv_q16_dual(jnp.asarray(q1buf), jnp.asarray(sc),
                                jnp.asarray(p), jnp.asarray(qv))
    s_mat = np.zeros((ms, n))
    for li in range(mb):
        for k in range(cb):
            t = li * cb + k
            s_mat[li * tb:(li + 1) * tb, k * tb:(k + 1) * tb] = \
                q1buf[t * tb:(t + 1) * tb].astype(np.float64) * 0.25
    np.testing.assert_array_equal(np.asarray(yd, np.float64),
                                  s_mat @ p.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(yt, np.float64),
                                  s_mat.T @ qv.astype(np.float64))
