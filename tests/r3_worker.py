"""R=3 leg of the 2-D grid suite (VERDICT r3 weak item 5).

Every in-repo 2-D test ran at R=2, so the general-R paths (the
half-slab mirror pairing in pcg2d_symm, `_transpose_perm` at R>2)
shipped untested. This worker executes them on a 3x3 virtual CPU mesh:
the main suite's conftest pins 8 devices (fits only R=2), so
tests/test_sharded2d_r3.py runs THIS script in a subprocess with 9.

Covers the same program x storage matrix the R=2 suite does: the
non-symmetric 2-D SUMMA grid (f64/xla), the symmetric grid (df64,
dfq + irq, fq + irfq), and the device-built gen-mode fq plane.
Prints one `R3_OK <case>` token per passing case; the wrapping test
asserts all of them.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=9")

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import lam_tpu  # noqa: E402,F401  (x64 on)
from lam_tpu import cg_solve, cg_solve_ir  # noqa: E402
from lam_tpu import generate as gen  # noqa: E402
from lam_tpu.parallel.pcg2d import Sharded2DOperator, make_mesh2d  # noqa: E402
from lam_tpu.parallel.pcg2d_symm import Symm2DOperator  # noqa: E402

TB = 128
N = 700
R = 3


def _ok(case):
    print(f"R3_OK {case}", flush=True)


def main():
    nd = len(jax.devices())
    assert nd >= R * R, f"need {R * R} virtual devices, have {nd}"
    mesh = make_mesh2d(R)
    assert mesh.devices.shape == (R, R)

    a = gen.random_spd_matrix(N, seed=77)
    b = gen.random_rhs(N, seed=87)
    bn = np.linalg.norm(b)

    def true_rel(x):
        return np.linalg.norm(b - a @ np.asarray(x)[:N]) / bn

    # non-symmetric 2-D SUMMA grid (f64/xla on CPU)
    op = Sharded2DOperator.from_dense(a, mesh=mesh)
    res = cg_solve(op, b, max_iters=2000, rel_error=1e-9)
    assert bool(res.converged) and true_rel(res.x) < 1e-8
    _ok("2d")

    # symmetric grid, unquantized planes: accurate CG + f32-inner ir
    op = Symm2DOperator.from_dense(a, mesh=mesh, tb=TB)
    res = cg_solve(op, b, max_iters=2000, rel_error=1e-9)
    assert bool(res.converged) and true_rel(res.x) < 1e-8
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=5000, rel_error=1e-9)
    assert bool(res.converged) and true_rel(res.x) < 1e-8
    _ok("sym2d")

    # quantized-lo storage + irq
    op = Symm2DOperator.from_dense(a, mesh=mesh, tb=TB, precision="dfq")
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=10000,
                      rel_error=1e-9, inner_floor=1e-2)
    assert bool(res.converged) and true_rel(res.x) < 1e-8
    _ok("sym2d-dfq")

    # fully-quantized storage: accurate CG + irfq
    op = Symm2DOperator.from_dense(a, mesh=mesh, tb=TB, precision="fq")
    res = cg_solve(op, b, max_iters=2000, rel_error=1e-9)
    assert bool(res.converged) and true_rel(res.x) < 1e-8
    res = cg_solve_ir(op.as_f32(), op, b, max_iters=10000,
                      rel_error=1e-9, inner_floor=1e-2)
    assert bool(res.converged) and true_rel(res.x) < 1e-8
    _ok("sym2d-fq")

    # device-built gen-mode fq plane: closed-form matvec + irfq
    ng = 600
    ag = np.asarray(gen.tridiagonal_matrix(ng))
    bg = np.ones(ng)
    op = Symm2DOperator.from_gen_fq(ng, mesh=mesh, tb=TB)
    p = gen.random_rhs(ng, seed=9)
    ap = np.asarray(op.matvec(op.prepare_b(p)))[:ng]
    np.testing.assert_allclose(ap, ag @ p, rtol=1e-12, atol=1e-12)
    res = cg_solve_ir(op.as_f32(), op, bg, max_iters=5000,
                      rel_error=1e-9, inner_floor=1e-2)
    assert bool(res.converged)
    assert (np.linalg.norm(bg - ag @ np.asarray(res.x)[:ng])
            / np.linalg.norm(bg)) < 1e-8
    _ok("gen-fq")

    print("R3_ALL_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
