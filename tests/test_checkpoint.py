"""Checkpoint/resume and segmented solving."""

import numpy as np

from lam_tpu import DenseOperator, cg_solve
from lam_tpu import generate as gen
from lam_tpu.solver import checkpoint as ckpt


def _system(n=96, seed=31):
    return gen.random_spd_matrix(n, seed=seed), gen.random_rhs(n, seed + 1)


def test_segmented_equals_monolithic():
    a, b = _system()
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    mono = cg_solve(op, b, max_iters=1000, rel_error=1e-9)
    seg, seg_times = ckpt.cg_solve_resumable(op, b, max_iters=1000,
                                             rel_error=1e-9, segment=17)
    # identical recurrence -> identical trajectory (same op order)
    assert int(seg.num_iters) == int(mono.num_iters)
    np.testing.assert_allclose(np.asarray(seg.x), np.asarray(mono.x),
                               rtol=1e-12, atol=1e-14)
    assert sum(k for k, _ in seg_times) == int(seg.num_iters)


def test_checkpoint_resume_roundtrip(tmp_path):
    a, b = _system(seed=37)
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    ck = str(tmp_path / "ck")

    # run only 30 iterations, checkpointing
    partial, _ = ckpt.cg_solve_resumable(op, b, max_iters=30,
                                         rel_error=1e-9, segment=10,
                                         checkpoint_path=ck)
    assert not bool(partial.converged)

    # resume to completion from the on-disk state
    resumed, _ = ckpt.cg_solve_resumable(op, b, max_iters=1000,
                                         rel_error=1e-9, segment=50,
                                         checkpoint_path=ck, resume=True)
    assert bool(resumed.converged)

    # must match an uninterrupted solve (same recurrence modulo the f64
    # roundtrip through the checkpoint files, which is exact)
    mono = cg_solve(op, b, max_iters=1000, rel_error=1e-9)
    assert int(resumed.num_iters) == int(mono.num_iters)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(mono.x),
                               rtol=1e-10, atol=1e-12)


def test_checkpoint_rejects_wrong_size(tmp_path):
    import pytest
    a, b = _system(seed=41)
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    ck = str(tmp_path / "ck")
    ckpt.cg_solve_resumable(op, b, max_iters=10, rel_error=1e-9,
                            segment=10, checkpoint_path=ck)
    a2, b2 = _system(n=64, seed=43)
    op2 = DenseOperator.from_dense(a2, precision="f64", engine="xla")
    with pytest.raises(ValueError):
        ckpt.cg_solve_resumable(op2, b2, max_iters=10, rel_error=1e-9,
                                checkpoint_path=ck, resume=True)


def test_resumable_on_sharded_and_symm_backends(tmp_path):
    """Segmented/checkpointed solves are not a local-backend-only
    capability: both sharded operators drive them via their generic
    matvec."""
    import jax.numpy as jnp
    from lam_tpu import generate as gen
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg import ShardedDenseOperator
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    from lam_tpu.solver.checkpoint import cg_solve_resumable

    a, b = (gen.random_spd_matrix(256, seed=61),
            gen.random_rhs(256, seed=71))
    bn = np.linalg.norm(b)
    ops = [
        ShardedDenseOperator.from_dense(a, mesh=make_mesh(4),
                                        precision="f64", engine="xla"),
        SymmShardedOperator.from_dense(a, mesh=make_mesh(4), tb=128),
    ]
    for op in ops:
        ck = str(tmp_path / type(op).__name__)
        res, segs = cg_solve_resumable(op, b, max_iters=40, segment=20,
                                       rel_error=1e-9,
                                       checkpoint_path=ck)
        assert int(res.num_iters) == 40 and len(segs) == 2
        res2, _ = cg_solve_resumable(op, b, max_iters=2000, segment=500,
                                     rel_error=1e-9,
                                     checkpoint_path=ck, resume=True)
        assert bool(res2.converged)
        x = np.asarray(res2.x)
        assert np.linalg.norm(b - a @ x) / bn < 1e-8


def _badly_scaled_system(n=96, seed=87):
    a = gen.random_spd_matrix(n, seed=seed)
    s = np.exp(np.linspace(0, 4, n))
    return a * np.outer(s, s), gen.random_rhs(n, seed + 1)


def test_pcg_segmented_equals_monolithic():
    """Jacobi-PCG through the resumable driver follows the exact
    trajectory of cg_solve(..., preconditioner='jacobi')."""
    a, b = _badly_scaled_system()
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    mono = cg_solve(op, b, max_iters=3000, rel_error=1e-9,
                    preconditioner="jacobi")
    seg, seg_times = ckpt.cg_solve_resumable(op, b, max_iters=3000,
                                             rel_error=1e-9, segment=17,
                                             preconditioner="jacobi")
    assert int(seg.num_iters) == int(mono.num_iters)
    np.testing.assert_allclose(np.asarray(seg.x), np.asarray(mono.x),
                               rtol=1e-12, atol=1e-14)
    assert sum(k for k, _ in seg_times) == int(seg.num_iters)


def test_pcg_checkpoint_resume_roundtrip(tmp_path):
    a, b = _badly_scaled_system(seed=91)
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    ck = str(tmp_path / "ck")
    partial, _ = ckpt.cg_solve_resumable(op, b, max_iters=30,
                                         rel_error=1e-9, segment=10,
                                         checkpoint_path=ck,
                                         preconditioner="jacobi")
    assert not bool(partial.converged)
    resumed, _ = ckpt.cg_solve_resumable(op, b, max_iters=3000,
                                         rel_error=1e-9, segment=50,
                                         checkpoint_path=ck, resume=True,
                                         preconditioner="jacobi")
    assert bool(resumed.converged)
    mono = cg_solve(op, b, max_iters=3000, rel_error=1e-9,
                    preconditioner="jacobi")
    # same recurrence modulo the exact f64 roundtrip of the vectors;
    # rr/rz scalars roundtrip through JSON floats exactly too
    assert int(resumed.num_iters) == int(mono.num_iters)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(mono.x),
                               rtol=1e-10, atol=1e-12)


def test_pcg_checkpoint_kind_mismatch_rejected(tmp_path):
    import pytest
    a, b = _badly_scaled_system(seed=95)
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    ck = str(tmp_path / "ck")
    ckpt.cg_solve_resumable(op, b, max_iters=10, rel_error=1e-9,
                            segment=10, checkpoint_path=ck,
                            preconditioner="jacobi")
    with pytest.raises(ValueError, match="pcg"):
        ckpt.cg_solve_resumable(op, b, max_iters=10, rel_error=1e-9,
                                checkpoint_path=ck, resume=True)
    ck2 = str(tmp_path / "ck2")
    ckpt.cg_solve_resumable(op, b, max_iters=10, rel_error=1e-9,
                            segment=10, checkpoint_path=ck2)
    with pytest.raises(ValueError, match="cg"):
        ckpt.cg_solve_resumable(op, b, max_iters=10, rel_error=1e-9,
                                checkpoint_path=ck2, resume=True,
                                preconditioner="jacobi")


def test_pcg_resumable_sharded(tmp_path):
    """Checkpointed PCG on the band-pair symmetric sharded operator —
    backend-generic like the plain resumable driver."""
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator

    a, b = _badly_scaled_system(n=256, seed=99)
    bn = np.linalg.norm(b)
    op = SymmShardedOperator.from_dense(a, mesh=make_mesh(4), tb=128)
    ck = str(tmp_path / "ck")
    res, segs = ckpt.cg_solve_resumable(op, b, max_iters=40, segment=20,
                                        rel_error=1e-9,
                                        checkpoint_path=ck,
                                        preconditioner="jacobi")
    assert int(res.num_iters) == 40 and len(segs) == 2
    res2, _ = ckpt.cg_solve_resumable(op, b, max_iters=5000, segment=500,
                                      rel_error=1e-9,
                                      checkpoint_path=ck, resume=True,
                                      preconditioner="jacobi")
    assert bool(res2.converged)
    x = np.asarray(res2.x)
    assert np.linalg.norm(b - a @ x) / bn < 1e-8


# --- resumable ir (round 3; VERDICT.md item 7) ------------------------------


def test_ir_checkpoint_resume_matches_uninterrupted(tmp_path):
    """A solve interrupted at a cycle boundary and resumed must land on
    EXACTLY the state of an uninterrupted resumable solve (f64 binary
    round-trip is exact), and agree with the fused cg_solve_ir loop."""
    import numpy as np

    from lam_tpu import DenseOperator, cg_solve_ir
    from lam_tpu import generate as gen
    from lam_tpu.solver.checkpoint import cg_solve_ir_resumable

    n = 300
    a, b = gen.random_spd_system(n, seed=33)
    op = DenseOperator.from_dense(a, precision="df64")
    op32 = op.as_f32()

    # uninterrupted resumable run
    full, cycles = cg_solve_ir_resumable(op32, op, b, max_iters=10000,
                                         rel_error=1e-9)
    assert bool(full.converged) and len(cycles) >= 2

    # interrupted after 1 cycle, checkpointed, resumed
    ck = str(tmp_path / "ir_ck")
    part, _ = cg_solve_ir_resumable(op32, op, b, max_iters=10000,
                                    rel_error=1e-9, max_cycles=1,
                                    checkpoint_path=ck)
    assert not bool(part.converged)
    res, _ = cg_solve_ir_resumable(op32, op, b, max_iters=10000,
                                   rel_error=1e-9, checkpoint_path=ck,
                                   resume=True)
    assert bool(res.converged)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(full.x))

    # and the fused on-device loop agrees on quality
    fused = cg_solve_ir(op32, op, b, max_iters=10000, rel_error=1e-9)
    bn = np.linalg.norm(b)
    assert np.linalg.norm(b - a @ np.asarray(res.x)) / bn < 1e-8
    assert np.linalg.norm(b - a @ np.asarray(fused.x)) / bn < 1e-8


def test_ir_jacobi_checkpoint_resume_matches_uninterrupted(tmp_path):
    """ir + jacobi + checkpoint (the full round-3 composition):
    interrupt at a cycle boundary, resume, land exactly on the
    uninterrupted trajectory; and a resume WITHOUT the preconditioner
    is refused (the sidecar records it)."""
    import numpy as np
    import pytest

    from lam_tpu import DenseOperator
    from lam_tpu import generate as gen
    from lam_tpu.solver.checkpoint import cg_solve_ir_resumable

    n = 300
    a, b = gen.random_spd_system(n, seed=34)
    s = np.exp(np.linspace(0, 3, n))
    a = a * np.outer(s, s)
    op = DenseOperator.from_dense(a, precision="df64")
    op32 = op.as_f32()

    full, cycles = cg_solve_ir_resumable(op32, op, b, max_iters=20000,
                                         rel_error=1e-9,
                                         preconditioner="jacobi")
    assert bool(full.converged) and len(cycles) >= 2

    ck = str(tmp_path / "irj_ck")
    cg_solve_ir_resumable(op32, op, b, max_iters=20000, rel_error=1e-9,
                          max_cycles=1, checkpoint_path=ck,
                          preconditioner="jacobi")
    res, _ = cg_solve_ir_resumable(op32, op, b, max_iters=20000,
                                   rel_error=1e-9, checkpoint_path=ck,
                                   resume=True, preconditioner="jacobi")
    assert bool(res.converged)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(full.x))
    bn = np.linalg.norm(b)
    assert np.linalg.norm(b - a @ np.asarray(res.x)) / bn < 1e-8

    with pytest.raises(ValueError, match="preconditioner"):
        cg_solve_ir_resumable(op32, op, b, max_iters=20000,
                              rel_error=1e-9, checkpoint_path=ck,
                              resume=True)


def test_ir_checkpoint_wrong_size_rejected(tmp_path):
    import pytest

    from lam_tpu import DenseOperator
    from lam_tpu import generate as gen
    from lam_tpu.solver.checkpoint import cg_solve_ir_resumable

    a, b = gen.random_spd_system(200, seed=34)
    op = DenseOperator.from_dense(a, precision="df64")
    ck = str(tmp_path / "ck")
    cg_solve_ir_resumable(op.as_f32(), op, b, max_iters=100,
                          rel_error=1e-9, max_cycles=1,
                          checkpoint_path=ck)
    a2, b2 = gen.random_spd_system(300, seed=35)
    op2 = DenseOperator.from_dense(a2, precision="df64")
    with pytest.raises(ValueError, match="checkpoint"):
        cg_solve_ir_resumable(op2.as_f32(), op2, b2, checkpoint_path=ck,
                              resume=True)


def test_ir_checkpoint_sharded(tmp_path):
    """The resumable ir driver is backend-generic: the packed symmetric
    band-pair operator's shard_map matvecs compose under _ir_cycle."""
    import numpy as np

    from lam_tpu import generate as gen
    from lam_tpu.parallel.mesh import make_mesh
    from lam_tpu.parallel.pcg_symm import SymmShardedOperator
    from lam_tpu.solver.checkpoint import cg_solve_ir_resumable

    n = 300
    a, b = gen.random_spd_system(n, seed=36)
    op = SymmShardedOperator.from_dense(a, mesh=make_mesh(4), tb=128,
                                        packed=True)
    ck = str(tmp_path / "ck")
    cg_solve_ir_resumable(op.as_f32(), op, b, max_iters=10000,
                          rel_error=1e-9, max_cycles=1,
                          checkpoint_path=ck)
    res, _ = cg_solve_ir_resumable(op.as_f32(), op, b, max_iters=10000,
                                   rel_error=1e-9, checkpoint_path=ck,
                                   resume=True)
    assert bool(res.converged)
    bn = np.linalg.norm(b)
    assert np.linalg.norm(b - a @ np.asarray(res.x)) / bn < 1e-8


def test_irq_checkpoint_resume_matches_uninterrupted(tmp_path):
    """--checkpoint composes with precision='irq' the same way as 'ir':
    cycle-boundary persistence on the quantized-lo operator, bit-exact
    resume. Tolerance is CPU-reachable (XLA:CPU defeats the interpreted
    dfq kernel's compensation, flooring refinement around 1e-7 — see
    tests/test_dfq.py; the strict 1e-9 irq claims are hardware tests)."""
    from lam_tpu.solver.checkpoint import cg_solve_ir_resumable
    n = 700
    tol = 1e-6
    a = gen.random_spd_matrix(n, seed=31)
    b = gen.random_rhs(n, seed=32)
    op = DenseOperator.from_dense_dfq(a)
    ck = str(tmp_path / "irq.ck")
    full, _ = cg_solve_ir_resumable(op.as_f32(), op, b, max_iters=10000,
                                    rel_error=tol)
    part, _ = cg_solve_ir_resumable(op.as_f32(), op, b, max_iters=10000,
                                    rel_error=tol, max_cycles=1,
                                    checkpoint_path=ck)
    res, _ = cg_solve_ir_resumable(op.as_f32(), op, b, max_iters=10000,
                                   rel_error=tol, checkpoint_path=ck,
                                   resume=True)
    assert bool(res.converged)
    np.testing.assert_array_equal(np.asarray(res.x),
                                  np.asarray(full.x))
    true_rel = (np.linalg.norm(b - a @ np.asarray(res.x)[:n])
                / np.linalg.norm(b))
    assert true_rel < 1e-5


def test_irfq_checkpoint_resume_matches_uninterrupted(tmp_path):
    """--checkpoint composes with precision='irfq' too: cycle-boundary
    persistence on the fully-quantized operator, bit-exact resume, with
    the coarse inner operator's 1e-2 floor (the CLI passes it —
    lam_tpu/cli.py). Tolerance 1e-5: on XLA:CPU the interpreted fq
    accurate matvec's broken EFT floors refinement around 1e-6 (this
    seed stalls at 1.1e-6; the 1e-9 claims are hardware tests)."""
    from lam_tpu.solver.checkpoint import cg_solve_ir_resumable
    n = 700
    tol = 1e-5
    a = gen.random_spd_matrix(n, seed=33)
    b = gen.random_rhs(n, seed=34)
    op = DenseOperator.from_dense_fq(a)
    ck = str(tmp_path / "irfq.ck")
    kw = dict(max_iters=10000, rel_error=tol, inner_floor=1e-2)
    full, _ = cg_solve_ir_resumable(op.as_f32(), op, b, **kw)
    part, _ = cg_solve_ir_resumable(op.as_f32(), op, b, max_cycles=2,
                                    checkpoint_path=ck, **kw)
    res, _ = cg_solve_ir_resumable(op.as_f32(), op, b,
                                   checkpoint_path=ck, resume=True, **kw)
    assert bool(res.converged)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(full.x))
    true_rel = (np.linalg.norm(b - a @ np.asarray(res.x)[:n])
                / np.linalg.norm(b))
    assert true_rel < 1e-5
