"""Steady-state heat-equation demo: the reference application, CG-powered.

The reference app (heat_equation-main/src/heat_equation.cpp) relaxes the
steady-state temperature of an nx x ny plate with plain Jacobi sweeps
(4-neighbor average, heat_iteration :75-89) until the max pointwise
update falls below epsilon=1e-3 (:115-148) — despite its README calling
it a CG solve (SURVEY.md §8.10). Boundaries: north=0, south/west/east=100
(:160-168); interior initialized to the boundary average (:27-48); grid
written in the shared binary format with (ny, nx) header (:203).

This rebuild provides BOTH:
  * `solve_heat_jacobi` — numerics-parity port of the reference sweep
    (vectorized, whole loop on device in lax.while_loop);
  * `solve_heat_cg` — the BASELINE.json config-#5 reformulation: the
    steady state solves the SPD 5-point-Laplacian system A u = b over the
    interior, driven MATRIX-FREE through the same CG engine as the dense
    solver. Converges in O(grid side) iterations instead of Jacobi's
    O(side^2) — on the reference's 1200x1000 default this is ~100x fewer
    iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lam_tpu.solver.cg import cg_solve
from lam_tpu.solver.operators import (LinearOperator, MatrixFreeOperator,
                                      _wrap_matvec)

BC_NORTH = 0.0
BC_SOUTH = 100.0
BC_WEST = 100.0
BC_EAST = 100.0


def initial_grid(nx, ny, bc_north=BC_NORTH, bc_south=BC_SOUTH,
                 bc_west=BC_WEST, bc_east=BC_EAST):
    """Boundary conditions + interior average, exactly as
    set_initial_solution (heat_equation.cpp:27-48). Returns (ny, nx),
    row y=0 = south."""
    grid = np.zeros((ny, nx), dtype=np.float64)
    grid[ny - 1, 1:nx - 1] = bc_north
    grid[0, 1:nx - 1] = bc_south
    grid[1:ny - 1, 0] = bc_west
    grid[1:ny - 1, nx - 1] = bc_east
    grid[0, 0] = (bc_south + bc_west) / 2
    grid[ny - 1, 0] = (bc_north + bc_west) / 2
    # NB: the reference indexes the two east corners with ny-1 as the
    # COLUMN (heat_equation.cpp:36-37) — correct only for square grids.
    # We index with nx-1 (the intended east column).
    grid[0, nx - 1] = (bc_south + bc_east) / 2
    grid[ny - 1, nx - 1] = (bc_north + bc_east) / 2
    initial_val = ((nx - 1) * bc_north + (nx - 1) * bc_south
                   + (ny - 1) * bc_west + (ny - 1) * bc_east) \
        / (2 * nx + 2 * ny - 4)
    grid[1:ny - 1, 1:nx - 1] = initial_val
    return grid


@jax.jit
def _jacobi_loop(grid, max_iters, epsilon):
    def sweep(g):
        interior = (g[2:, 1:-1] + g[:-2, 1:-1]
                    + g[1:-1, :-2] + g[1:-1, 2:]) / 4.0
        return g.at[1:-1, 1:-1].set(interior)

    def cond(carry):
        _, diff, k = carry
        return jnp.logical_and(k < max_iters, diff >= epsilon)

    def body(carry):
        g, _, k = carry
        g_new = sweep(g)
        diff = jnp.max(jnp.abs(g_new[1:-1, 1:-1] - g[1:-1, 1:-1]))
        return (g_new, diff, k + 1)

    g, diff, k = jax.lax.while_loop(cond, body,
                                    (grid, jnp.inf, jnp.int32(0)))
    return g, diff, k


def solve_heat_jacobi(grid, max_iters=1_000_000, epsilon=1e-3):
    """Parity port of solve_heat (heat_equation.cpp:115-148)."""
    g, diff, k = _jacobi_loop(jnp.asarray(grid), jnp.int32(max_iters),
                              epsilon)
    return np.asarray(g), int(k), float(diff)


@functools.lru_cache(maxsize=None)
def _laplace_matvec(nyi, nxi):
    """Matrix-free 5-point Laplacian on an (nyi, nxi) interior.

    A u = 4u - u_N - u_S - u_W - u_E with zero (Dirichlet-absorbed)
    padding: SPD, so CG applies. The operand is unused (shape is baked)."""

    def mv(operand, p):
        del operand
        u = p.reshape(nyi, nxi)
        out = 4.0 * u
        out = out - jnp.pad(u[1:, :], ((0, 1), (0, 0)))   # north neighbor
        out = out - jnp.pad(u[:-1, :], ((1, 0), (0, 0)))  # south neighbor
        out = out - jnp.pad(u[:, 1:], ((0, 0), (0, 1)))   # east
        out = out - jnp.pad(u[:, :-1], ((0, 0), (1, 0)))  # west
        return out.reshape(-1)

    return mv


@functools.lru_cache(maxsize=None)
def _laplace_matvec_padded(nyi, nxi, H, W):
    """Masked 5-point Laplacian on the padded (H, W) grid (XLA, dtype-
    polymorphic). Same semantics as _laplace_matvec on the leading
    (nyi, nxi) interior; keeps padding exactly zero so it shares a
    vector space with the Pallas kernel (ops/stencil.py invariant)."""

    inner_mv = _laplace_matvec(nyi, nxi)

    def mv(operand, p):
        u = p.reshape(H, W)[:nyi, :nxi]
        out = inner_mv(operand, u.reshape(-1)).reshape(nyi, nxi)
        return jnp.pad(out, ((0, H - nyi), (0, W - nxi))).reshape(-1)

    return mv


@functools.lru_cache(maxsize=None)
def _laplace_matvec_dot_pallas(nyi, nxi, H, W, tbr):
    """Fused (Ap, p.Ap) via the Pallas stencil kernel — one read of p,
    one write of y per matvec (the XLA pad formulation moves ~7x the
    bytes; see ops/stencil.py)."""
    from lam_tpu.ops.stencil import laplace5_f32

    def mvd(operand, p):
        del operand
        y, d = laplace5_f32(p.reshape(H, W), nyi=nyi, nxi=nxi, tbr=tbr)
        return y.reshape(-1), d

    return mvd


class _StencilOperator(LinearOperator):
    """Operator on the 2-D zero-padded grid vector space.

    The generic base pads/crops 1-D tails; the stencil pads in 2-D
    (rows to H, columns to W), so prepare_b/extract_x are overridden.
    All CG vectors keep exact zeros in the padding (masked matvecs), so
    dot products and norms are unaffected."""

    def __init__(self, matvec_dot_fn, operand, nyi, nxi, H, W, dtype):
        super().__init__(matvec_dot_fn, operand, nyi * nxi, H * W, dtype)
        self._dims = (nyi, nxi, H, W)

    def prepare_b(self, b):
        nyi, nxi, H, W = self._dims
        b = jnp.asarray(b, dtype=self.vector_dtype)
        if b.shape != (self.n,):
            raise ValueError(f"rhs has shape {b.shape}, "
                             f"expected ({self.n},)")
        return jnp.pad(b.reshape(nyi, nxi),
                       ((0, H - nyi), (0, W - nxi))).reshape(-1)

    def extract_x(self, x_padded):
        nyi, nxi, H, W = self._dims
        return x_padded.reshape(H, W)[:nyi, :nxi].reshape(-1)


def solve_heat_cg(grid, max_iters=100_000, rel_error=1e-10,
                  precision="auto"):
    """Steady state via CG on the 5-point Laplacian system.

    Unknowns are the interior cells; the boundary enters as the rhs
    b[i,j] = sum of adjacent boundary temperatures. The fixed point of
    the reference's Jacobi sweep is exactly the solution of this system.

    precision: 'f64' runs the whole loop in f64 (native on CPU, the
    oracle path; SLOW on TPU where f64 is software-emulated — measured
    88 ms/iteration at 1200x1000). 'ir' runs the inner CG in f32 with
    f64 true-residual refinement restarts — the same mixed-precision
    engine as the dense solver, with the inner matvec being the fused
    Pallas 5-point stencil kernel (ops/stencil.py: one read of p, one
    write of y, in-kernel p.Ap partials) on the 2-D padded grid and the
    refinement matvec the masked XLA stencil on the same vector space.
    'auto' picks 'ir' on TPU (measured 1200x1000: 350 s f64-emulated ->
    0.56 s), 'f64' elsewhere.
    """
    import jax

    grid = np.asarray(grid, dtype=np.float64)
    ny, nx = grid.shape
    nyi, nxi = ny - 2, nx - 2
    b = np.zeros((nyi, nxi), dtype=np.float64)
    b[0, :] += grid[0, 1:nx - 1]           # south boundary row
    b[-1, :] += grid[ny - 1, 1:nx - 1]     # north
    b[:, 0] += grid[1:ny - 1, 0]           # west
    b[:, -1] += grid[1:ny - 1, nx - 1]     # east

    if precision == "auto":
        precision = "ir" if jax.default_backend() == "tpu" else "f64"
    if precision == "ir":
        from lam_tpu.ops.stencil import padded_hw
        from lam_tpu.solver.cg import cg_solve_ir
        H, W, tbr = padded_hw(nyi, nxi)
        operand = jnp.zeros(())
        op = _StencilOperator(
            _wrap_matvec(_laplace_matvec_padded(nyi, nxi, H, W)),
            operand, nyi, nxi, H, W, jnp.float64)
        op32 = _StencilOperator(
            _laplace_matvec_dot_pallas(nyi, nxi, H, W, tbr),
            operand, nyi, nxi, H, W, jnp.float32)
        # the Laplacian's condition number grows as O(side^2), so one
        # f32 inner cycle recovers fewer digits than on the dense SPD
        # spectrum — allow more refinement restarts than the dense
        # default (each costs one f64 stencil apply, negligible)
        res = cg_solve_ir(op32, op, b.reshape(-1), max_iters=max_iters,
                          rel_error=rel_error, max_cycles=40)
    else:
        op = MatrixFreeOperator(_laplace_matvec(nyi, nxi), jnp.zeros(()),
                                nyi * nxi)
        res = cg_solve(op, b.reshape(-1), max_iters=max_iters,
                       rel_error=rel_error)
    out = grid.copy()
    out[1:ny - 1, 1:nx - 1] = np.asarray(res.x).reshape(nyi, nxi)
    return out, int(res.num_iters), float(res.rel_residual)
