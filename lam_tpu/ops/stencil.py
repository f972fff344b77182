"""Pallas TPU 5-point Laplacian stencil (heat-equation demo hot op).

The reference demo's hot loop is a 4-neighbor Jacobi sweep over the
plate (heat_equation.cpp:75-89); the rebuild solves the same steady
state with CG on the 5-point Laplacian (SURVEY.md §3.5 rebuild note),
so the hot op becomes the stencil MATVEC

    y[i,j] = 4 p[i,j] - p[i-1,j] - p[i+1,j] - p[i,j-1] - p[i,j+1]

with zero (Dirichlet-eliminated) boundary. The XLA formulation via
jnp.pad materializes the padded array and re-reads it once per shifted
term — ~70 MB of HBM traffic per 1200x1000 f32 matvec where ~10 MB
(read p once, write y once) suffices. This kernel reads each input
element once:

  * The grid is padded to (H, W): W a lane multiple, H a multiple of
    the row-tile tbr. Padding cells hold ZERO in every CG vector (the
    output mask below keeps them zero), so out-of-range neighbor reads
    are zeros by construction.
  * grid = (H//tbr,); each step loads its (tbr, W) row block plus TWO
    single halo rows (the adjacent blocks' boundary rows, gathered by
    the caller with a strided slice) — north/south shifts then happen
    in VMEM via sublane concatenate, west/east via lane concatenate.
  * The p . Ap dot that the CG loop fuses into every matvec
    (solver/cg.py matvec_dot contract) is accumulated in-kernel as
    per-block partials — saving the two extra full-array reads an XLA
    dot of the kernel's opaque output would cost.
  * Output masked to the valid interior (scalar-prefetched row limit,
    static column limit) so padding stays exactly zero (a padded cell
    bordering the interior would otherwise accumulate -p_neighbor and
    feed back into the solve).
  * The outermost boundary rows (`up_edge`/`dn_edge`) are explicit
    inputs: zeros for the single-device grid, ppermute'd neighbor rows
    when the grid is ROW-SHARDED over a mesh (lam_tpu/apps/heat.py) —
    the same kernel serves both; halo exchange is the caller's job.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lam_tpu.ops.gemv import _LANES, _VMEM_CAP, _use_interpret

_SUBLANES = 8


def padded_hw(nyi, nxi, tbr_target=256, row_groups=1):
    """(H, W, tbr): grid padded so W % 128 == 0 and H % (row_groups *
    tbr) == 0 (row_groups > 1 = shards of a row-sharded grid, each a
    whole number of tiles)."""
    W = -(-nxi // _LANES) * _LANES
    per = -(-nyi // row_groups)
    if per >= tbr_target:
        tbr = tbr_target
    else:  # small shards: one sublane-aligned block each
        tbr = -(-per // _SUBLANES) * _SUBLANES
    H = -(-nyi // (row_groups * tbr)) * (row_groups * tbr)
    return H, W, tbr


def _laplace5_kernel(nrows_ref, p_ref, up_ref, dn_ref, y_ref, dot_ref,
                     *, nxi):
    # up/dn/dot blocks span their whole (G, W)/(G, 1) arrays (constant
    # index maps — tiny, VMEM-resident across grid steps); each step
    # reads/writes its own row i dynamically. nrows_ref is the
    # scalar-prefetched count of valid rows (traced: it differs per
    # shard under shard_map).
    i = pl.program_id(0)
    tbr, w = p_ref.shape
    p = p_ref[...]
    up_row = up_ref[pl.dslice(i, 1), :]
    dn_row = dn_ref[pl.dslice(i, 1), :]
    north = jnp.concatenate([up_row, p[:-1, :]], axis=0)
    south = jnp.concatenate([p[1:, :], dn_row], axis=0)
    zcol = jnp.zeros((tbr, 1), jnp.float32)
    west = jnp.concatenate([zcol, p[:, :-1]], axis=1)
    east = jnp.concatenate([p[:, 1:], zcol], axis=1)
    rows = i * tbr + jax.lax.broadcasted_iota(jnp.int32, (tbr, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tbr, w), 1)
    mask = jnp.logical_and(rows < nrows_ref[0], cols < nxi)
    y = jnp.where(mask, 4.0 * p - north - south - west - east, 0.0)
    y_ref[...] = y
    dot_ref[pl.dslice(i, 1), :] = jnp.sum(p * y).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("nxi", "tbr"))
def laplace5_f32_halo(p2d, up_edge, dn_edge, nrows_valid, *, nxi, tbr):
    """(y, p_dot_y) for the masked 5-point Laplacian on a padded block.

    p2d: (Hb, W) f32 with Hb % tbr == 0, W % 128 == 0, and zeros
    outside the valid interior (leading `nrows_valid` rows x nxi cols).
    up_edge/dn_edge: (1, W) rows adjacent to this block's top/bottom —
    zeros at the true boundary, the neighbor shard's edge rows when the
    grid is row-sharded. nrows_valid: int32 scalar (traced). Returns
    y (Hb, W) with the same zero-padding invariant, and the scalar
    p . y over this block.
    """
    H, W = p2d.shape
    if H % tbr or W % _LANES:
        raise ValueError(f"padded grid ({H}, {W}) must be a multiple of "
                         f"(tbr={tbr}, {_LANES})")
    G = H // tbr
    # adjacent tile-blocks' boundary rows (block i needs rows
    # i*tbr - 1 and (i+1)*tbr); strided-slice gathers, the caller's
    # edge rows at the outer ends
    up = jnp.concatenate([up_edge, p2d[tbr - 1::tbr][: G - 1]], axis=0)
    dn = jnp.concatenate([p2d[tbr::tbr], dn_edge], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((tbr, W), lambda i, nr: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W), lambda i, nr: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W), lambda i, nr: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tbr, W), lambda i, nr: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda i, nr: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    y, partials = pl.pallas_call(
        functools.partial(_laplace5_kernel, nxi=nxi),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((G, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(nrows_valid, jnp.int32).reshape(1),
      p2d, up, dn)
    return y, jnp.sum(partials)


def laplace5_f32(p2d, *, nyi, nxi, tbr):
    """Single-device form: zero edges, static row limit (see
    laplace5_f32_halo)."""
    W = p2d.shape[1]
    zrow = jnp.zeros((1, W), jnp.float32)
    return laplace5_f32_halo(p2d, zrow, zrow, nyi, nxi=nxi, tbr=tbr)
