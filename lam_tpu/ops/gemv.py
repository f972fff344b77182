"""Pallas TPU dense-matvec kernels.

TPU-native replacement for the reference's hand-written CUDA kernel suite
(`gemv` one-block-per-row + shared-memory tree reduction, `partialDot`,
`reduce`, chunked `gemv_host` launcher — ConjugateGradient_GPU_CUDA.cu:16-223,
copy-pasted into all four GPU backends). Design differences, deliberately
TPU-first (SURVEY.md §2.4):

  * ONE kernel set shared by every solver configuration; sharding maps the
    same kernel over mesh shards (the reference re-declares the kernels
    per backend).
  * The grid streams (TM, TK) tiles of A HBM->VMEM with Pallas's implicit
    double buffering; output row-blocks accumulate across the K grid
    dimension in VMEM. No kernel-launch storm (the reference launches
    ceil(N/1000) sequential kernels per matvec, .cu:214-223).
  * f64 capability on an f32 machine: `gemv_df64` consumes the matrix as
    two f32 planes (hi+lo = exactly f64's 8 bytes/element -> HBM-bandwidth
    parity with an fp64 GPU) and compensates EVERY multiply (Dekker
    two_prod) and EVERY add (Knuth two_sum lane accumulators), yielding
    ~2^-48 relative error -- f64 quality at f32 speed. The VPU does the
    compensated arithmetic; it stays under the HBM roofline.

Shapes must be pre-padded: n % TILE_K == 0 (operators pad with zeros,
which is exact for CG -- lam_tpu/solver/operators.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lam_tpu.precision import fast_two_sum, two_prod, two_sum

# Default tiles: A tile = TILE_M x TILE_K f32 (1 MB); double-buffered
# pipelining keeps the DMA engine saturated. PAD_MULTIPLE in operators.py
# is the lcm of these. Env overrides for tuning sweeps.
# Sweep on v5e @ N=20000 (full ir solves): (256,1024) 0.899 s beats
# (512,512) 0.905 s and (256,512) 0.983 s; (512,1024) fails to compile
# (VMEM).
import os as _os

TILE_M = int(_os.environ.get("LAM_TPU_TILE_M", 256))
TILE_K = int(_os.environ.get("LAM_TPU_TILE_K", 1024))
_LANES = 128

# Mosaic's default scoped-vmem cap is 16 MB (v5e VMEM is 128 MB); the
# larger tile shapes need more for multi-buffered pipelining.
_VMEM_CAP = 64 * 1024 * 1024


def _use_interpret():
    # Pallas TPU kernels run compiled on TPU; everywhere else (CPU CI,
    # the 8-device virtual mesh in tests) they run in interpreter mode.
    return jax.default_backend() != "tpu"


def _fit_tile(dim, preferred, name):
    """Largest power-of-two tile <= preferred that divides dim.

    Shapes are zero-padded by the operator layer, but arbitrary callers
    (sharded local blocks, tests) may pass any multiple of 128 — fit the
    tile rather than silently truncating the grid. Tiles must be
    power-of-two multiples of the 128-lane width (the df64 kernel's slab
    loop and lane tree assume it)."""
    t = 1 << (min(preferred, dim).bit_length() - 1)  # largest pow2 <= min
    while t >= _LANES:
        if dim % t == 0:
            return t
        t //= 2
    raise ValueError(
        f"{name}={dim} is not a multiple of any usable tile (min "
        f"{_LANES}); pad the operand (see lam_tpu/solver/operators.py)")


# ---------------------------------------------------------------------------
# f32 gemv
# ---------------------------------------------------------------------------


def _lane_fold(t, acc):
    """Fold the TK columns of t (TM, TK) into 128-lane accumulators."""
    s = acc
    for j in range(t.shape[1] // _LANES):
        s = s + t[:, j * _LANES:(j + 1) * _LANES]
    return s


def _lane_tree(s):
    """Halving tree-reduce of (TM, 128) lane accumulators to (TM, 1)."""
    width = _LANES
    while width > 1:
        half = width // 2
        s = s[:, :half] + s[:, half:width]
        width = half
    return s


def _gemv_f32_kernel_dot(a_ref, p_ref, o_ref):
    part = jax.lax.dot_general(
        a_ref[:], p_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[:] = o_ref[:] + part


def _gemv_f32_kernel_vpu(a_ref, p_ref, o_ref, acc):
    """VPU lane-accumulator variant: a (TM,TK)x(TK,1) dot_general maps to
    the MXU with 1 of 128 result columns used, and at gemv shapes that
    wasted MXU time is comparable to the HBM time — the multiply-adds go
    to the VPU instead (2 ops/element, far under the VPU roofline), same
    shape as the df64 kernel's accumulation."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    t = a_ref[:] * p_ref[:]        # (TM, TK), p broadcasts over rows
    acc[:] = _lane_fold(t, acc[:])

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = _lane_tree(acc[:])


_F32_IMPL = _os.environ.get("LAM_TPU_F32_IMPL", "dot")


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k", "impl"))
def gemv_f32(a, p, *, tile_m=TILE_M, tile_k=TILE_K, impl=None):
    """y = A @ p for f32 A (m, n), p (n,); m, n divisible by the tiles.

    A may be a row-block of a larger matrix (the sharded local matvec).
    impl: 'dot' (dot_general, default) or 'vpu' (lane accumulators)
    — measured equal in full solves on v5e (both HBM-bound); 'dot' kept
    as the established default."""
    if impl is None:
        impl = _F32_IMPL
    if impl not in ("dot", "vpu"):
        raise ValueError(
            f"impl={impl!r} (or LAM_TPU_F32_IMPL) must be 'dot' or 'vpu'")
    m, n = a.shape
    tile_m = _fit_tile(m, tile_m, "rows")
    tile_k = _fit_tile(n, tile_k, "cols")
    grid = (m // tile_m, n // tile_k)
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k), lambda i, k: (i * 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i, k: (i, k * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )
    if impl == "vpu":
        out = pl.pallas_call(
            _gemv_f32_kernel_vpu,
            scratch_shapes=[pltpu.VMEM((tile_m, _LANES), jnp.float32)],
            **common,
        )(a, p.reshape(1, n))
    else:
        out = pl.pallas_call(_gemv_f32_kernel_dot, **common)(
            a, p.reshape(1, n))
    return out.reshape(m)


# ---------------------------------------------------------------------------
# f32 column-block gemv (ring-overlap building block)
# ---------------------------------------------------------------------------
#
# y_part = A[:, blk*nb : (blk+1)*nb] @ p_blk with blk a RUNTIME index.
# The block index arrives via scalar prefetch so the BlockSpec index_map
# steers the DMA engine directly at the selected column stripe — no
# HBM->HBM copy of the stripe (a dynamic_slice feeding a pallas_call
# would materialize one, doubling traffic). This is the per-step kernel
# of the ring matvec (lam_tpu/parallel/pcg.py): while the VPU multiplies
# the stripe owned p-block, the next p-block rides ICI via ppermute.


def _gemv_f32_cols_kernel(blk_ref, a_ref, p_ref, o_ref):
    del blk_ref  # consumed by the index_map
    part = jax.lax.dot_general(
        a_ref[:], p_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = part

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[:] = o_ref[:] + part


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k"))
def gemv_f32_cols(a, p_blk, blk, *, tile_m=TILE_M, tile_k=TILE_K):
    """Partial matvec against one column block of A (f32).

    a: (m, n); p_blk: (nb,) with n % nb == 0; blk: int32 scalar/array,
    the block index in units of nb columns (0 <= blk < n // nb — an
    out-of-range index is silently clamped by the TPU DMA engine, so it
    cannot be checked in the compiled kernel). Returns (m,) f32."""
    m, n = a.shape
    nb = p_blk.shape[0]
    if n % nb != 0:
        raise ValueError(f"cols={n} not divisible by block size nb={nb}")
    tile_m = _fit_tile(m, tile_m, "rows")
    tile_k = _fit_tile(nb, tile_k, "cols")
    tiles_per_blk = nb // tile_k
    grid = (m // tile_m, tiles_per_blk)
    blk = jnp.asarray(blk, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k),
                         lambda i, k, blk_ref:
                         (i, blk_ref[0] * tiles_per_blk + k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k), lambda i, k, blk_ref: (i * 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i, k, blk_ref:
                               (i, k * 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gemv_f32_cols_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(blk, a, p_blk.reshape(1, nb))
    return out.reshape(m)


# ---------------------------------------------------------------------------
# symmetric f32 gemv: read only the lower triangle -> HALF the HBM traffic
# ---------------------------------------------------------------------------
#
# CG matrices are symmetric by contract (SPD), but every reference backend
# streams all N^2 elements per matvec (ConjugateGradient_GPU_CUDA.cu:171-211
# and clones). For a bandwidth-bound kernel that's a straight 2x on the
# table: visit only the nblk(nblk+1)/2 lower-triangle tiles; each
# off-diagonal tile A_ik contributes BOTH A_ik @ p_k to y_i (direct) and
# A_ik^T @ p_i to y_k (transpose) while it sits in VMEM. The (i,k) walk
# is row-major over the triangle, delivered to the index_maps through two
# scalar-prefetched tables. Direct partials accumulate in a (TB,128) lane
# scratch flushed at each diagonal tile; transpose partials accumulate in
# a persistent (1,n) scratch emitted at the last grid step. The operator
# effect is EXACTLY symmetric (the full-matrix kernel's rounding makes the
# applied operator slightly non-symmetric) — a mild bonus for CG theory.
# Storage stays the full square (the upper half is simply never read).

SYMM_TB = int(_os.environ.get("LAM_TPU_SYMM_TB", 512))


@functools.lru_cache(maxsize=None)
def _symm_tables(nblk):
    iis, kks = [], []
    for i in range(nblk):
        for k in range(i + 1):
            iis.append(i)
            kks.append(k)
    import numpy as _np
    return (_np.asarray(iis, _np.int32), _np.asarray(kks, _np.int32))


def tri_tile_count(nblk):
    """Tiles in the lower triangle of an nblk x nblk tile grid."""
    return nblk * (nblk + 1) // 2


# Walk tiles per grid step of the BLOCKED q16 kernel: a (Q16_P*tb, tb)
# int16 block is one contiguous 4 MiB DMA instead of eight 512 KiB
# ones, cutting the per-grid-step fixed cost that dominated the q16
# kernel's gap to its DMA floor. Measured on the real v5e at N=114688
# (results/Q16_PROBE2_r04.log): P=8 full kernel 600 GB/s vs 501
# shipping; the pure-stream floor at this block size is 650.
Q16_P = 8

# Per-tile product engine of the q16 kernels (IMPORT-TIME knob — the
# kernels are jitted at module scope, so flip it via the env var in a
# fresh process, not by assignment). The knob governs the local blocked,
# sharded slab, AND dual (2-D) q16 kernels alike (each resolves
# _q16_impl at trace time; hardware parity asserted in tests/test_tpu.py).
#   "auto" (default) "mxu" at n >= Q16_MXU_MIN_N, "vpu" below. The MXU
#                    win only exists at DMA-floor sizes; below the
#                    threshold the kernel is overhead-dominated AND the
#                    bf16 rounding measurably costs refinement cycles
#                    (n=2048: 8 outer cycles vs 5, 685 vs ~460 inner
#                    iterations), so small systems keep the exact-f32
#                    VPU products.
#   "mxu"            single-pass MXU dots at DEFAULT precision: AT the
#                    DMA floor (646 vs 598 GB/s VPU at N=114688,
#                    results/Q16_PROBE4_r04.log). The MXU bf16-rounds
#                    both operands (~2^-9 operator error vs the
#                    quantization's 2^-16), which the irfq refinement
#                    absorbs almost for free at scale: measured
#                    end-to-end at N=20000, 0.293 s vs 0.313 s, +6
#                    inner iterations, identical 9.5e-10 TRUE residual
#                    (results/Q16_E2E_r04.log).
#   "vpu"            f32 elementwise products + lane-fold / halving
#                    tree; products exact in f32 against the int16
#                    plane. The fallback when the inner operator must
#                    be bit-faithful to the stored quantization.
_Q16_IMPL = _os.environ.get("LAM_Q16_IMPL", "auto")
Q16_MXU_MIN_N = 16384


def _q16_impl(n):
    if _Q16_IMPL == "auto":
        return "mxu" if n >= Q16_MXU_MIN_N else "vpu"
    return _Q16_IMPL


def padded_tri_tile_count(nblk, p=Q16_P):
    """Triangle tile count rounded up to a multiple of the q16 block
    factor — the STORED plane size of padded fq layouts."""
    t = tri_tile_count(nblk)
    return -(-t // p) * p


@functools.lru_cache(maxsize=None)
def _symm_tables_padded(nblk, p=Q16_P):
    """Walk tables padded to a multiple of p with INERT entries
    (i=0, k=1): k > i so neither the diagonal write nor the transpose
    branch fires, k != 0 so the row accumulator is never reset, and
    both block indices are in range (requires nblk >= 2). The padded
    plane carries all-zero tiles there and producers zero the padded
    scales, so the fold contributes exactly 0."""
    if nblk < 2:
        raise ValueError("padded walk tables need nblk >= 2 (the inert "
                         "(0, 1) entry must be in range)")
    import numpy as _np
    it, kt = _symm_tables(nblk)
    pad = padded_tri_tile_count(nblk, p) - len(it)
    if pad:
        it = _np.concatenate([it, _np.zeros(pad, _np.int32)])
        kt = _np.concatenate([kt, _np.ones(pad, _np.int32)])
    return it, kt


# --- PACKED triangle storage -------------------------------------------------
#
# The symm kernels walk lower-triangle tiles in a FIXED order (the it/kt
# tables). Storing only those tiles, stacked in walk order into a
# (T*tb, tb) buffer, halves HBM *capacity* (the full-square layout halved
# only reads — its upper half was allocated but never touched) and turns
# the A index_map into the identity (t, 0): tile t of the walk is
# block-row t of the packed buffer. Reads become fully sequential in HBM
# (the full-square walk hops (it, kt) tile addresses). Round-3 addition;
# the capacity halving is what lets N~60000 df64 fit ONE v5e
# (BASELINE.md budget table) — the reference never exploits symmetry at
# all (ConjugateGradient_GPU_CUDA.cu:171-223 streams all N^2 elements).


def pack_tri_host(a, tb, it=None, kt=None):
    """Pack a full square (n_p, n_p) host array into walk-order triangle
    tiles (T*tb, tb). With it/kt given, packs THAT walk (slab tables);
    default is the local row-major triangle walk."""
    import numpy as _np
    a = _np.asarray(a)
    if it is None:
        nblk = a.shape[0] // tb
        it, kt = _symm_tables(nblk)
    out = _np.empty((len(it) * tb, tb), dtype=a.dtype)
    for t, (i, k) in enumerate(zip(it, kt)):
        out[t * tb:(t + 1) * tb] = a[i * tb:(i + 1) * tb,
                                     k * tb:(k + 1) * tb]
    return out


def _packed_geometry(buf, p, what):
    """(tb, nblk, T) of a packed buffer + operand vector; validates."""
    tb = buf.shape[1]
    n = p.shape[0]
    if tb < _LANES or tb & (tb - 1):
        raise ValueError(f"{what}: packed tile width {tb} must be a "
                         f"power-of-two multiple of {_LANES}")
    if n % tb or buf.shape[0] % tb:
        raise ValueError(f"{what}: n={n} and packed rows "
                         f"{buf.shape[0]} must be multiples of tb={tb}")
    nblk = n // tb
    T = buf.shape[0] // tb
    return tb, nblk, T


def _gemv_f32_symm_kernel(it_ref, kt_ref, a_ref, prow_ref, pcol_ref,
                          yd_ref, yt_ref, acc_d, acc_t):
    _symm_f32_step(it_ref[pl.program_id(0)], kt_ref[pl.program_id(0)],
                   a_ref[:], prow_ref[:], pcol_ref[:], yd_ref, yt_ref,
                   acc_d, acc_t)


def _symm_f32_step(i, k, a, prow, pcol, yd_ref, yt_ref,
                   acc_d, acc_t):
    """One triangle-walk grid step of the f32 symmetric matvec — shared
    by the f32 kernel (a read straight from the plane) and the q16
    kernel (a dequantized from an int16 tile, see `gemv_q16_symm`).
    prow (1, tb) / pcol (tb, 1) are VALUES: the q16 caller folds its
    per-tile scale into them (tb ops) instead of into a (tb^2 ops)."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_t[:] = jnp.zeros_like(acc_t)

    @pl.when(k == 0)
    def _():
        acc_d[:] = jnp.zeros_like(acc_d)

    tb = a.shape[0]

    # direct: y_i += A_ik @ p_k, folded into 128 lane accumulators
    acc_d[:] = _lane_fold(a * prow, acc_d[:])

    @pl.when(k == i)                   # diagonal tile = last of row i
    def _():
        yd_ref[:] = _lane_tree(acc_d[:])

    @pl.when(k < i)                    # strictly-lower: transpose term
    def _():
        tpart = jnp.sum(a * pcol, axis=0, keepdims=True)  # (1, TB)
        idx = pl.dslice(k * tb, tb)
        acc_t[:, idx] = acc_t[:, idx] + tpart

    @pl.when(t == nt - 1)
    def _():
        yt_ref[:] = acc_t[:]


@functools.partial(jax.jit, static_argnames=("tb", "packed"))
def gemv_f32_symm(a, p, *, tb=None, packed=False):
    """y = A @ p for SYMMETRIC f32 A, reading only the lower triangle
    (~half the HBM bytes of `gemv_f32`). n % tb == 0 required
    (operators pad); correctness requires A == A.T (CG's contract).

    packed=False: a is the full square (n, n); the upper half is never
    read (capacity unchanged). packed=True: a is the (T*tb, tb) walk-
    order triangle buffer from `pack_tri_host` — half the capacity too.

    The products stay on the VPU deliberately: an MXU variant (two
    skinny dot_generals per tile) was measured WORSE on v5e — 0.81 s vs
    0.49 s for the N=20000 ir solve, needing 642 instead of 365 inner
    iterations, because the MXU's default-precision f32 matmul is
    bf16-class and degrades the inner CG's convergence."""
    n = p.shape[0]
    if packed:
        tb, nblk, T = _packed_geometry(a, p, "gemv_f32_symm")
        if T != tri_tile_count(nblk):
            raise ValueError(
                f"packed buffer has {T} tiles, triangle of nblk={nblk} "
                f"needs {tri_tile_count(nblk)}")
        a_map = lambda t, it_ref, kt_ref: (t, t * 0)
    else:
        if tb is None:
            tb = SYMM_TB
        if a.shape != (n, n):
            raise ValueError(f"symmetric gemv needs a square matrix, "
                             f"got {a.shape}")
        tb = _fit_tile(n, tb, "rows")
        nblk = n // tb
        a_map = lambda t, it_ref, kt_ref: (it_ref[t], kt_ref[t])
    it, kt = _symm_tables(nblk)
    grid = (len(it),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb),
                         lambda t, it_ref, kt_ref: (t * 0, kt_ref[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref: (it_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref: (it_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n),
                         lambda t, it_ref, kt_ref: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    yd, yt = pl.pallas_call(
        _gemv_f32_symm_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), a, p.reshape(1, n),
      p.reshape(n, 1))
    return yd.reshape(n) + yt.reshape(n)


# ---------------------------------------------------------------------------
# symmetric SLAB kernel: the sharded twin of gemv_f32_symm
# ---------------------------------------------------------------------------
#
# A shard holds a SLAB of band rows of the symmetric matrix (the
# balanced band-pair decomposition of lam_tpu/parallel/pcg_symm.py);
# the kernel walks only the slab's lower-triangle tiles. Three
# scalar-prefetched tables drive the walk: it (GLOBAL row-tile index —
# decides diagonal/transpose behavior and the p/pcol selection), kt
# (column tile), lt (LOCAL slab row-tile — steers the A reads and the
# yd writes). Outputs: yd over the slab's rows (direct terms) and a
# full-length yt (transpose terms, scattered over columns); the caller
# scatters yd into the global vector and psums across shards.


def _gemv_f32_symm_slab_kernel(it_ref, kt_ref, lt_ref, a_ref, prow_ref,
                               pcol_ref, yd_ref, yt_ref, acc_d, acc_t):
    # identical walk semantics to _gemv_f32_symm_kernel; lt_ref is
    # consumed by the index_maps only
    _gemv_f32_symm_kernel(it_ref, kt_ref, a_ref, prow_ref, pcol_ref,
                          yd_ref, yt_ref, acc_d, acc_t)


@functools.partial(jax.jit, static_argnames=("tb", "packed", "ms"))
def gemv_f32_symm_slab(a_slab, p, it, kt, lt, *, tb=None, packed=False,
                       ms=None):
    """Partial symmetric matvec over a slab of band rows.

    packed=False: a_slab is (ms, n) f32 — the shard's rows of the
    SYMMETRIC matrix (full width; only lower-triangle tiles are ever
    read). packed=True: a_slab is the (T*tb, tb) walk-order buffer of
    the slab's triangle tiles (T == len(it)); `ms` (the slab's row
    count, for the yd output) must then be given. p: (n,) f32. it/kt/
    lt: int32 tile tables (see module comment). Returns (yd (ms,), yt
    (n,)): y_global = scatter(yd -> owned rows) + yt, summed across
    shards."""
    n = p.shape[0]
    if packed:
        tb, _, T = _packed_geometry(a_slab, p, "gemv_f32_symm_slab")
        if T != it.shape[0]:
            raise ValueError(f"packed slab has {T} tiles but the walk "
                             f"table has {it.shape[0]}")
        if ms is None or ms % tb:
            raise ValueError("packed slab needs ms (a multiple of tb)")
        a_map = lambda t, it_ref, kt_ref, lt_ref: (t, t * 0)
    else:
        if tb is None:
            tb = SYMM_TB
        ms, n_a = a_slab.shape
        if n_a != n:
            raise ValueError(f"slab width {n_a} != p length {n}")
        fitted = _fit_tile(min(ms, n), tb, "rows")
        if fitted != tb:
            # the it/kt/lt tables are expressed in tb-tile units; a
            # silent refit here would reinterpret them in the wrong
            # units (finite but WRONG partial sums) — reject instead
            raise ValueError(
                f"tb={tb} unusable for slab shape ({ms}, {n}): the tile "
                f"tables require tb to be a power-of-two multiple of "
                f"128 dividing the band size (nearest usable: {fitted})")
        a_map = lambda t, it_ref, kt_ref, lt_ref: (lt_ref[t], kt_ref[t])
    grid = (it.shape[0],)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb),
                         lambda t, it_ref, kt_ref, lt_ref:
                         (t * 0, kt_ref[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref, lt_ref:
                         (it_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref, lt_ref:
                         (lt_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n),
                         lambda t, it_ref, kt_ref, lt_ref:
                         (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    yd, yt = pl.pallas_call(
        _gemv_f32_symm_slab_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), jnp.asarray(lt), a_slab,
      p.reshape(1, n), p.reshape(n, 1))
    return yd.reshape(ms), yt.reshape(n)


# ---------------------------------------------------------------------------
# df64 (float-float) gemv with fully compensated accumulation
# ---------------------------------------------------------------------------

def _df64_kernel_body(ah_ref, al_ref, ph_ref, pl_ref, yh_ref, yl_ref,
                      acc_s, acc_c, *, comp="full"):
    """Grid (rows, cols): per step, fold a (TM, TK) tile of exact products
    into 128 compensated lane-accumulators per row; on the last K step,
    tree-reduce the lanes (compensated) and emit (y_hi, y_lo).

    The exact product uses the branch-free Veltkamp/Dekker split. An
    FMA-contraction shortcut (err = ah*ph - t_hi, 2 ops instead of ~17)
    was measured on v5e Mosaic and is NOT contracted there: a full
    N=20000 solve converged by recurrence but its TRUE residual degraded
    to 2.3e-7 (vs 9.8e-10 with Dekker), i.e. the error term silently
    evaluated to 0 — so the shortcut is not offered.

    comp selects the compensation budget (hardware-validated by full
    N=20000 solves with host-checked f64 true residuals, docs/REPORT.md):
      'nolow' (default) — drop the al*plo cross term of the low-order
                product sum (~2^-48-relative per product, sqrt(N)*2^-48
                ~ 1e-12 in the sum: below the target's noise floor).
                Every product stays exact, every add compensated.
                Measured: 2.297 s vs full's 2.482 s at N=20000, true
                residual 9.794e-10 for BOTH, same 359 iterations.
      'full'  — also accumulate al*plo (the strict every-term budget).
    A third budget ('fast': Kahan fold via fast_two_sum, 3 fewer VPU
    ops/element) was tried and REJECTED on hardware evidence: the
    fast_two_sum |s| >= |term| precondition fails on early slabs, and a
    full N=20000 solve converged by recurrence with a TRUE residual of
    2.2e-7 — the same silent-degradation signature as the FMA trap
    above. Knuth two_sum in the fold is load-bearing."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_c[:] = jnp.zeros_like(acc_c)

    ah = ah_ref[:]          # (TM, TK)
    al = al_ref[:]
    ph = ph_ref[:]          # (1, TK) broadcasts over rows
    plo = pl_ref[:]

    # Exact product: a*p = t_hi + t_lo with a = ah+al, p = ph+plo.
    t_hi, t_err = two_prod(ah, ph)
    cross = ah * plo + al * ph
    if comp == "full":
        cross = cross + al * plo
    t_lo = t_err + cross

    # Fold TK columns into the 128 lane accumulators, compensating every
    # add: (s, c) += slab  =>  s, e = two_sum(s, slab); c += e + slab_lo.
    tm, tk = t_hi.shape
    s = acc_s[:]
    c = acc_c[:]
    if comp == "defer":
        # slab-amortized renormalization — see _symm_df64_step
        gs = t_hi[:, 0:_LANES]
        gc = t_lo[:, 0:_LANES]
        for j in range(1, tk // _LANES):
            sl = slice(j * _LANES, (j + 1) * _LANES)
            gs = gs + t_hi[:, sl]
            gc = gc + t_lo[:, sl]
        s, e = two_sum(s, gs)
        c = c + (e + gc)
    else:
        for j in range(tk // _LANES):
            sl = slice(j * _LANES, (j + 1) * _LANES)
            s, e = two_sum(s, t_hi[:, sl])
            c = c + (e + t_lo[:, sl])
    acc_s[:] = s
    acc_c[:] = c

    @pl.when(k == nk - 1)
    def _():
        # Compensated binary tree across the 128 lanes.
        s_ = acc_s[:]
        c_ = acc_c[:]
        width = _LANES
        while width > 1:
            half = width // 2
            s2, e = two_sum(s_[:, :half], s_[:, half:width])
            c_ = c_[:, :half] + c_[:, half:width] + e
            s_ = s2
            width = half
        hi, lo = fast_two_sum(s_, c_)
        yh_ref[:] = hi
        yl_ref[:] = lo


_DF64_COMP = _os.environ.get("LAM_TPU_DF64_COMP", "nolow")
_DF64_COMPS = ("full", "nolow")
# 'defer' is the round-4 slab-amortized-renormalization EXPERIMENT
# (VERDICT r3 item 8): exact Dekker products, plain in-tile group adds,
# one two_sum per tile. Its hardware verdict is REJECTED — the full-solve
# TRUE residual degrades to 3.3e-07 while the recurrence still reports
# ~1e-9 (results/DF64_DEFER_r04.log) — so it is NOT selectable as a comp
# mode: a user flipping LAM_TPU_DF64_COMP=defer would get converged=True
# with a silently wrong answer. The kernel path survives for measurement
# behind the private hook below (scripts/df64_defer.py sets it).
_DF64_ALLOW_REJECTED = _os.environ.get(
    "LAM_TPU_DF64_ALLOW_REJECTED_COMPS", "") == "1"


def _resolve_comp(comp):
    comp = comp or _DF64_COMP
    if comp == "defer" and _DF64_ALLOW_REJECTED:
        return comp
    if comp not in _DF64_COMPS:
        raise ValueError(
            f"comp={comp!r} (or LAM_TPU_DF64_COMP) must be one of "
            f"{_DF64_COMPS} ('defer' was rejected on hardware: true "
            "residual 3.3e-07 vs the 1e-9 target, "
            "results/DF64_DEFER_r04.log)")
    return comp


def _df64_cols_kernel(blk_ref, ah_ref, al_ref, ph_ref, pl_ref, yh_ref,
                      yl_ref, acc_s, acc_c, *, comp):
    del blk_ref  # consumed by the index_maps
    _df64_kernel_body(ah_ref, al_ref, ph_ref, pl_ref, yh_ref, yl_ref,
                      acc_s, acc_c, comp=comp)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k", "comp"))
def gemv_df64_cols(a_hi, a_lo, p_hi, p_lo, blk, *, tile_m=TILE_M,
                   tile_k=TILE_K, comp=None):
    """Partial float-float matvec against one column block of A.

    Column-block twin of `gemv_df64` (same compensated arithmetic), with
    the block index scalar-prefetched as in `gemv_f32_cols` (same
    0 <= blk < n // nb contract — out-of-range DMA indices clamp
    silently on TPU). p_hi/p_lo are the (nb,) block of the operand
    vector."""
    comp = _resolve_comp(comp)
    m, n = a_hi.shape
    nb = p_hi.shape[0]
    if n % nb != 0:
        raise ValueError(f"cols={n} not divisible by block size nb={nb}")
    tile_m = _fit_tile(m, tile_m, "rows")
    tile_k = _fit_tile(nb, tile_k, "cols")
    tiles_per_blk = nb // tile_k
    grid = (m // tile_m, tiles_per_blk)
    blk = jnp.asarray(blk, jnp.int32).reshape(1)
    mat_spec = pl.BlockSpec((tile_m, tile_k),
                            lambda i, k, blk_ref:
                            (i, blk_ref[0] * tiles_per_blk + k),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, tile_k), lambda i, k, blk_ref: (i * 0, k),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_m, 1), lambda i, k, blk_ref: (i, k * 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((tile_m, _LANES), jnp.float32),
            pltpu.VMEM((tile_m, _LANES), jnp.float32),
        ],
    )
    yh, yl = pl.pallas_call(
        functools.partial(_df64_cols_kernel, comp=comp),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(blk, a_hi, a_lo, p_hi.reshape(1, nb), p_lo.reshape(1, nb))
    return yh.reshape(m), yl.reshape(m)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k", "comp"))
def gemv_df64(a_hi, a_lo, p_hi, p_lo, *, tile_m=TILE_M, tile_k=TILE_K,
              comp=None):
    """(y_hi, y_lo) = A @ p in float-float; all inputs f32, n % tiles == 0.

    A = a_hi + a_lo (two planes), p = p_hi + p_lo. Result is the
    correctly-rounded-to-~2^-48 product — the TPU answer to the
    reference's fp64 CUDA gemv (ConjugateGradient_GPU_CUDA.cu:171-223).
    comp: compensation budget (see _df64_kernel_body; default from
    LAM_TPU_DF64_COMP, 'nolow' — adopted round 2 after the tuning
    study in results/DF64_TUNE_r02.log).
    """
    comp = _resolve_comp(comp)
    m, n = a_hi.shape
    tile_m = _fit_tile(m, tile_m, "rows")
    tile_k = _fit_tile(n, tile_k, "cols")
    grid = (m // tile_m, n // tile_k)
    vec_spec = pl.BlockSpec((1, tile_k), lambda i, k: (i * 0, k),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((tile_m, tile_k), lambda i, k: (i, k),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_m, 1), lambda i, k: (i, k * 0),
                            memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        functools.partial(_df64_kernel_body, comp=comp),
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_m, _LANES), jnp.float32),
            pltpu.VMEM((tile_m, _LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(a_hi, a_lo, p_hi.reshape(1, n), p_lo.reshape(1, n))
    return yh.reshape(m), yl.reshape(m)


# ---------------------------------------------------------------------------
# symmetric df64 gemv: lower-triangle reads, fully compensated both ways
# ---------------------------------------------------------------------------
#
# The df64 twin of gemv_f32_symm: visit only the lower-triangle tiles of
# the (hi, lo) plane pair — HALF the HBM bytes of gemv_df64 — and emit
# each off-diagonal tile's direct term (A_ik @ p_k -> y_i) AND transpose
# term (A_ik^T @ p_i -> y_k) while it sits in VMEM, both with the same
# compensated arithmetic as _df64_kernel_body (exact Dekker products,
# Knuth two_sum accumulation; 'nolow'/'full' budgets). The direct path
# reuses the (TB, 128) lane-accumulator scheme; the transpose path
# tree-reduces each tile's products over rows down to 8 sublanes
# (compensated) and folds them into a persistent (8, n) accumulator
# pair, collapsed to (1, n) at the final grid step. The reference
# never exploits symmetry — its fp64 gemv streams all N^2 elements
# (ConjugateGradient_GPU_CUDA.cu:171-223).

_SYMM_T_SUBLANES = 8  # f32 sublane granularity: stop the per-tile tree here


def _df64_exact_tile(ah, al, bh, bl, comp):
    """Exact-product tile: (ah+al)*(bh+bl) -> (t_hi, t_lo) per element."""
    t_hi, t_err = two_prod(ah, bh)
    cross = ah * bl + al * bh
    if comp == "full":
        cross = cross + al * bl
    return t_hi, t_err + cross


def _gemv_df64_symm_kernel(it_ref, kt_ref, ah_ref, al_ref, prh_ref,
                           prl_ref, pch_ref, pcl_ref, ydh_ref, ydl_ref,
                           yth_ref, ytl_ref, accd_s, accd_c, acct_s,
                           acct_c, *, comp):
    t = pl.program_id(0)
    _symm_df64_step(it_ref[t], kt_ref[t], t, pl.num_programs(0),
                    ah_ref[:], al_ref[:], prh_ref, prl_ref, pch_ref,
                    pcl_ref, ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


def _symm_df64_step(i, k, t, nt, ah, al, prh_ref, prl_ref, pch_ref,
                    pcl_ref, ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp):
    """One triangle-walk grid step of the compensated symmetric matvec —
    shared by the df64 kernel (al read from the lo plane) and the dfq
    kernel (al dequantized from an int16 tile, see `gemv_dfq_symm`)."""
    @pl.when(t == 0)
    def _():
        acct_s[:] = jnp.zeros_like(acct_s)
        acct_c[:] = jnp.zeros_like(acct_c)

    @pl.when(k == 0)
    def _():
        accd_s[:] = jnp.zeros_like(accd_s)
        accd_c[:] = jnp.zeros_like(accd_c)

    tb = ah.shape[0]

    # direct: y_i += A_ik @ p_k (lane-compensated fold, as gemv_df64)
    t_hi, t_lo = _df64_exact_tile(ah, al, prh_ref[:], prl_ref[:], comp)
    s = accd_s[:]
    c = accd_c[:]
    if comp == "defer":
        # slab-amortized renormalization (round-4 experiment, VERDICT
        # r3 item 8): PLAIN-add the tile's tb/128 slabs into a group
        # partial, compensate ONCE per tile. Saves ~6 VPU flops per
        # slab element; costs one uncompensated rounding per plain add
        # (<= (k-1)*2^-24 relative to the group partial) — the
        # hypothesis under test is whether that bound stays below the
        # 1e-9 target across a full solve (scripts/df64_defer.py
        # measures time + TRUE residual on hardware).
        gs = t_hi[:, 0:_LANES]
        gc = t_lo[:, 0:_LANES]
        for j in range(1, tb // _LANES):
            sl = slice(j * _LANES, (j + 1) * _LANES)
            gs = gs + t_hi[:, sl]
            gc = gc + t_lo[:, sl]
        s, e = two_sum(s, gs)
        c = c + (e + gc)
    else:
        for j in range(tb // _LANES):
            sl = slice(j * _LANES, (j + 1) * _LANES)
            s, e = two_sum(s, t_hi[:, sl])
            c = c + (e + t_lo[:, sl])
    accd_s[:] = s
    accd_c[:] = c

    @pl.when(k == i)                  # diagonal tile = last of row i
    def _():
        s_ = accd_s[:]
        c_ = accd_c[:]
        width = _LANES
        while width > 1:
            half = width // 2
            s2, e = two_sum(s_[:, :half], s_[:, half:width])
            c_ = c_[:, :half] + c_[:, half:width] + e
            s_ = s2
            width = half
        hi, lo = fast_two_sum(s_, c_)
        ydh_ref[:] = hi
        ydl_ref[:] = lo

    @pl.when(k < i)                   # strictly-lower: transpose term
    def _():
        u_hi, u_lo = _df64_exact_tile(ah, al, pch_ref[:], pcl_ref[:],
                                      comp)
        # compensated tree over rows, down to 8 sublanes
        width = tb
        while width > _SYMM_T_SUBLANES:
            half = width // 2
            s2, e = two_sum(u_hi[:half], u_hi[half:width])
            u_lo = u_lo[:half] + u_lo[half:width] + e
            u_hi = s2
            width = half
        idx = pl.dslice(k * tb, tb)
        s2, e = two_sum(acct_s[:, idx], u_hi)
        acct_s[:, idx] = s2
        acct_c[:, idx] = acct_c[:, idx] + (e + u_lo)

    @pl.when(t == nt - 1)
    def _():
        s_ = acct_s[:]
        c_ = acct_c[:]
        width = _SYMM_T_SUBLANES
        while width > 1:
            half = width // 2
            s2, e = two_sum(s_[:half], s_[half:width])
            c_ = c_[:half] + c_[half:width] + e
            s_ = s2
            width = half
        hi, lo = fast_two_sum(s_, c_)
        yth_ref[:] = hi
        ytl_ref[:] = lo


DF64_SYMM_TB = int(_os.environ.get("LAM_TPU_DF64_SYMM_TB", 512))


def _lo_plane_map(a_hi, a_lo, a_map, tb, what):
    """Index map for the lo plane: same walk as hi, or — when lo is a
    single (tb, tb) tile — a constant (0, 0) broadcast. The broadcast
    form represents an identically-zero lo plane without storing it
    (gen-mode tridiagonal: entries {0,1,2} are exact in f32), reclaiming
    half the df64 pair's HBM capacity; the repeated 1-tile read stays
    resident and costs ~nothing."""
    if a_lo.shape == a_hi.shape:
        return a_map
    if a_lo.shape != (tb, tb):
        raise ValueError(
            f"{what}: lo plane must match the hi plane {a_hi.shape} or "
            f"be a single ({tb}, {tb}) broadcast tile, got {a_lo.shape}")
    return lambda t, *refs: (t * 0, t * 0)


@functools.partial(jax.jit, static_argnames=("tb", "comp", "packed"))
def gemv_df64_symm(a_hi, a_lo, p_hi, p_lo, *, tb=None, comp=None,
                   packed=False):
    """(y_hi, y_lo) = A @ p in float-float for SYMMETRIC A, reading only
    the lower-triangle tiles of both planes (~half the HBM bytes of
    `gemv_df64`). n % tb == 0 required (operators pad); correctness
    requires A == A.T — CG's contract, checked at operator build
    (lam_tpu/solver/operators.py _verifies_symmetric).

    packed=True: planes are (T*tb, tb) walk-order triangle buffers
    (`pack_tri_host`) — half the HBM *capacity* as well. The lo plane
    may also be a single (tb, tb) zero tile (see _lo_plane_map)."""
    comp = _resolve_comp(comp)
    n = p_hi.shape[0]
    if packed:
        tb, nblk, T = _packed_geometry(a_hi, p_hi, "gemv_df64_symm")
        if T != tri_tile_count(nblk):
            raise ValueError(
                f"packed buffer has {T} tiles, triangle of nblk={nblk} "
                f"needs {tri_tile_count(nblk)}")
        a_map = lambda t, it_ref, kt_ref: (t, t * 0)
    else:
        if tb is None:
            tb = DF64_SYMM_TB
        if a_hi.shape != (n, n):
            raise ValueError(f"symmetric df64 gemv needs square planes, "
                             f"got {a_hi.shape}")
        tb = _fit_tile(n, tb, "rows")
        nblk = n // tb
        a_map = lambda t, it_ref, kt_ref: (it_ref[t], kt_ref[t])
    lo_map = _lo_plane_map(a_hi, a_lo, a_map, tb, "gemv_df64_symm")
    it, kt = _symm_tables(nblk)
    grid = (len(it),)

    def tile_spec(index_map=a_map):
        return pl.BlockSpec((tb, tb), index_map,
                            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec((1, tb),
                            lambda t, it_ref, kt_ref: (t * 0, kt_ref[t]),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref: (it_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yd_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref: (it_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yt_spec():
        return pl.BlockSpec((1, n),
                            lambda t, it_ref, kt_ref: (t * 0, t * 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[tile_spec(), tile_spec(lo_map), row_spec(), row_spec(),
                  col_spec(), col_spec()],
        out_specs=(yd_spec(), yd_spec(), yt_spec(), yt_spec()),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_df64_symm_kernel, comp=comp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), a_hi, a_lo,
      p_hi.reshape(1, n), p_lo.reshape(1, n),
      p_hi.reshape(n, 1), p_lo.reshape(n, 1))
    # combine the direct and transpose (hi, lo) pairs, compensated
    s, e = two_sum(ydh.reshape(n), yth.reshape(n))
    lo = ydl.reshape(n) + ytl.reshape(n) + e
    return fast_two_sum(s, lo)


# ---------------------------------------------------------------------------
# dfq: quantized-lo packed symmetric gemv — the 6-byte f64 element
# ---------------------------------------------------------------------------
#
# The df64 pair costs 8 B/element even packed; at N=70000 that is
# ~20 GB — over one v5e's 16 GB HBM, which is why the reference-scale
# north-star (N=70000 to 1e-9, SURVEY.md §6) stayed a projection. The lo
# plane, however, carries only the f64 bits BELOW f32: |lo| <= ulp(hi)/2.
# Quantizing each packed lo TILE to int16 against a per-tile power-of-two
# scale (scale = 2^ceil(log2(max|lo|/32767)), reconstruction exact)
# stores those bits in 2 bytes: the element becomes hi f32 + lo int16 =
# 6 bytes, a 25% capacity cut that fits N=70000 packed on ONE v5e.
#
# Accuracy: quantization error <= scale/2 <= max|lo_tile|/32767 — about
# 2^-39 * max|a_tile| absolute per element, ~16 of the 29 lo bits kept.
# That is far below f32 storage (2^-24) and, after iterative refinement
# with THIS operator as the accurate matvec, lands true residuals at the
# 1e-10 scale (validated on hardware, tests/test_tpu.py). To keep tiles
# homogeneous the matrix DIAGONAL — systematically the largest entries
# of an SPD matrix, which would otherwise set every diagonal tile's
# scale — is extracted exactly (stored as an (n,) df64 pair in the
# operator) and zeroed in the planes; see DenseOperator dfq handling in
# lam_tpu/solver/operators.py.


def _pow2_scale(m):
    """Smallest power of two >= m/32767, frexp-exact (no libm log2
    rounding at power-of-two boundaries). ONE definition shared by the
    dfq and fq numpy packs: the value must stay bit-identical to the
    native pack (native/lam_native.cpp ln_q_scale) or caches/packs
    produced by the numpy and native paths would silently differ."""
    import numpy as _np
    fr, k = _np.frexp(m / 32767.0)
    return 2.0 ** (int(k) - 1 if fr == 0.5 else int(k))


def quantize_lo_tiles(lo_packed, tb):
    """Quantize a packed (T*tb, tb) f32 lo plane to (int16 tiles,
    per-tile f32 power-of-two scales). Reconstruction q * scale is exact
    (scale is a power of two); |lo - q*scale| <= scale/2 elementwise."""
    import numpy as _np
    lo_packed = _np.asarray(lo_packed, dtype=_np.float32)
    T = lo_packed.shape[0] // tb
    q = _np.empty_like(lo_packed, dtype=_np.int16)
    scales = _np.zeros((T,), dtype=_np.float32)
    for t in range(T):
        tile = lo_packed[t * tb:(t + 1) * tb]
        m = float(_np.abs(tile).max())
        if m == 0.0:
            q[t * tb:(t + 1) * tb] = 0
            continue
        scale = _pow2_scale(m)
        scales[t] = scale
        qt = _np.rint(tile.astype(_np.float64) / scale)
        q[t * tb:(t + 1) * tb] = _np.clip(qt, -32767, 32767)
    return q, scales


def _gemv_dfq_symm_kernel(it_ref, kt_ref, sc_ref, ah_ref, alq_ref,
                          prh_ref, prl_ref, pch_ref, pcl_ref, ydh_ref,
                          ydl_ref, yth_ref, ytl_ref, accd_s, accd_c,
                          acct_s, acct_c, *, comp):
    t = pl.program_id(0)
    # dequantize in VMEM: int16 -> f32 convert + one scalar multiply
    # (exact: power-of-two scale). ~2 extra VPU ops/element against the
    # ~25% HBM-byte saving — strictly bandwidth-bound territory.
    al = alq_ref[:].astype(jnp.float32) * sc_ref[t]
    _symm_df64_step(it_ref[t], kt_ref[t], t, pl.num_programs(0),
                    ah_ref[:], al, prh_ref, prl_ref, pch_ref, pcl_ref,
                    ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


@functools.partial(jax.jit, static_argnames=("comp",))
def gemv_dfq_symm(a_hi, a_loq, sc, p_hi, p_lo, *, comp=None):
    """(y_hi, y_lo) = A @ p for SYMMETRIC A in quantized-lo packed
    storage: a_hi the (T*tb, tb) walk-order f32 triangle (pack_tri_host),
    a_loq the int16 quantized lo tiles, sc the (T,) per-tile scales
    (quantize_lo_tiles). Same compensated triangle walk as
    `gemv_df64_symm(packed=True)`; lo values are dequantized in VMEM."""
    comp = _resolve_comp(comp)
    n = p_hi.shape[0]
    tb, nblk, T = _packed_geometry(a_hi, p_hi, "gemv_dfq_symm")
    if T != tri_tile_count(nblk):
        raise ValueError(
            f"packed buffer has {T} tiles, triangle of nblk={nblk} "
            f"needs {tri_tile_count(nblk)}")
    if a_loq.shape != a_hi.shape:
        raise ValueError(f"quantized lo plane shape {a_loq.shape} != hi "
                         f"plane {a_hi.shape}")
    if sc.shape != (T,):
        raise ValueError(f"scale table shape {sc.shape} != ({T},)")
    it, kt = _symm_tables(nblk)
    grid = (len(it),)
    a_map = lambda t, it_ref, kt_ref, sc_ref: (t, t * 0)

    def tile_spec():
        return pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, tb),
            lambda t, it_ref, kt_ref, sc_ref: (t * 0, kt_ref[t]),
            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec(
            (tb, 1),
            lambda t, it_ref, kt_ref, sc_ref: (it_ref[t], t * 0),
            memory_space=pltpu.VMEM)

    def yd_spec():
        return pl.BlockSpec(
            (tb, 1),
            lambda t, it_ref, kt_ref, sc_ref: (it_ref[t], t * 0),
            memory_space=pltpu.VMEM)

    def yt_spec():
        return pl.BlockSpec(
            (1, n),
            lambda t, it_ref, kt_ref, sc_ref: (t * 0, t * 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[tile_spec(), tile_spec(), row_spec(), row_spec(),
                  col_spec(), col_spec()],
        out_specs=(yd_spec(), yd_spec(), yt_spec(), yt_spec()),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_dfq_symm_kernel, comp=comp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), sc, a_hi, a_loq,
      p_hi.reshape(1, n), p_lo.reshape(1, n),
      p_hi.reshape(n, 1), p_lo.reshape(n, 1))
    s, e = two_sum(ydh.reshape(n), yth.reshape(n))
    lo = ydl.reshape(n) + ytl.reshape(n) + e
    return fast_two_sum(s, lo)


def _gemv_df64_symm_slab_kernel(it_ref, kt_ref, lt_ref, ah_ref, al_ref,
                                prh_ref, prl_ref, pch_ref, pcl_ref,
                                ydh_ref, ydl_ref, yth_ref, ytl_ref,
                                accd_s, accd_c, acct_s, acct_c, *, comp):
    # identical walk semantics to _gemv_df64_symm_kernel; lt_ref is
    # consumed by the index_maps only (slab-local A reads / yd writes)
    _gemv_df64_symm_kernel(it_ref, kt_ref, ah_ref, al_ref, prh_ref,
                           prl_ref, pch_ref, pcl_ref, ydh_ref, ydl_ref,
                           yth_ref, ytl_ref, accd_s, accd_c, acct_s,
                           acct_c, comp=comp)


@functools.partial(jax.jit,
                   static_argnames=("tb", "comp", "packed", "ms"))
def gemv_df64_symm_slab(ah_slab, al_slab, p_hi, p_lo, it, kt, lt, *,
                        tb=None, comp=None, packed=False, ms=None):
    """Partial SYMMETRIC float-float matvec over a slab of band rows —
    the df64 twin of `gemv_f32_symm_slab` (same it/kt/lt tile tables,
    see lam_tpu/parallel/pcg_symm.py). Returns ((ydh, ydl) over the
    slab's rows, (yth, ytl) full length): y_global = scatter(yd ->
    owned rows) + yt, summed across shards.

    packed=True: planes are (T*tb, tb) walk-order triangle buffers with
    `ms` the slab's row count; the lo plane may be a single (tb, tb)
    zero tile (see _lo_plane_map)."""
    comp = _resolve_comp(comp)
    n = p_hi.shape[0]
    if packed:
        tb, _, T = _packed_geometry(ah_slab, p_hi, "gemv_df64_symm_slab")
        if T != it.shape[0]:
            raise ValueError(f"packed slab has {T} tiles but the walk "
                             f"table has {it.shape[0]}")
        if ms is None or ms % tb:
            raise ValueError("packed slab needs ms (a multiple of tb)")
        a_map = lambda t, it_ref, kt_ref, lt_ref: (t, t * 0)
    else:
        if tb is None:
            tb = DF64_SYMM_TB
        ms, n_a = ah_slab.shape
        if al_slab.shape != (ms, n_a):
            raise ValueError(f"plane shapes differ: {ah_slab.shape} vs "
                             f"{al_slab.shape}")
        if n_a != n:
            raise ValueError(f"slab width {n_a} != p length {n}")
        fitted = _fit_tile(min(ms, n), tb, "rows")
        if fitted != tb:
            # the it/kt/lt tables are expressed in tb-tile units; a
            # silent refit here would reinterpret them in the wrong
            # units (finite but WRONG partial sums) — reject instead
            raise ValueError(
                f"tb={tb} unusable for slab shape ({ms}, {n}): the tile "
                f"tables require tb to be a power-of-two multiple of "
                f"128 dividing the band size (nearest usable: {fitted})")
        a_map = lambda t, it_ref, kt_ref, lt_ref: (lt_ref[t], kt_ref[t])
    lo_map = _lo_plane_map(ah_slab, al_slab, a_map, tb,
                           "gemv_df64_symm_slab")
    grid = (it.shape[0],)

    def tile_spec(index_map=a_map):
        return pl.BlockSpec((tb, tb), index_map,
                            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec((1, tb),
                            lambda t, it_ref, kt_ref, lt_ref:
                            (t * 0, kt_ref[t]),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref, lt_ref:
                            (it_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yd_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref, lt_ref:
                            (lt_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yt_spec():
        return pl.BlockSpec((1, n),
                            lambda t, it_ref, kt_ref, lt_ref:
                            (t * 0, t * 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[tile_spec(), tile_spec(lo_map), row_spec(), row_spec(),
                  col_spec(), col_spec()],
        out_specs=(yd_spec(), yd_spec(), yt_spec(), yt_spec()),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_df64_symm_slab_kernel, comp=comp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), jnp.asarray(lt), ah_slab,
      al_slab, p_hi.reshape(1, n), p_lo.reshape(1, n),
      p_hi.reshape(n, 1), p_lo.reshape(n, 1))
    return (ydh.reshape(ms), ydl.reshape(ms),
            yth.reshape(n), ytl.reshape(n))


def _gemv_dfq_symm_slab_kernel(it_ref, kt_ref, lt_ref, sc_ref, ah_ref,
                               alq_ref, prh_ref, prl_ref, pch_ref,
                               pcl_ref, ydh_ref, ydl_ref, yth_ref,
                               ytl_ref, accd_s, accd_c, acct_s, acct_c,
                               *, comp):
    t = pl.program_id(0)
    # dequantize the int16 lo tile in VMEM (exact: power-of-two scale),
    # then run the identical compensated slab walk step
    al = alq_ref[:].astype(jnp.float32) * sc_ref[t]
    _symm_df64_step(it_ref[t], kt_ref[t], t, pl.num_programs(0),
                    ah_ref[:], al, prh_ref, prl_ref, pch_ref, pcl_ref,
                    ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


@functools.partial(jax.jit, static_argnames=("comp", "ms"))
def gemv_dfq_symm_slab(ah_slab, alq_slab, sc, p_hi, p_lo, it, kt, lt, *,
                       ms, comp=None):
    """Partial SYMMETRIC quantized-lo matvec over a band-pair shard —
    the dfq twin of `gemv_df64_symm_slab(packed=True)` (same it/kt/lt
    walk tables, lam_tpu/parallel/pcg_symm.py): hi plane f32 walk-order
    triangle tiles, lo plane int16 against per-tile power-of-two scales
    (quantize_lo_tiles), 6 B/element per shard. Returns ((ydh, ydl)
    over the slab's ms rows, (yth, ytl) full length); caller scatters
    yd to the owned bands and psums across shards. The diagonal term is
    NOT included (it is extracted as a replicated df64 pair by the
    operator — see SymmShardedOperator dfq storage)."""
    comp = _resolve_comp(comp)
    n = p_hi.shape[0]
    tb, _, T = _packed_geometry(ah_slab, p_hi, "gemv_dfq_symm_slab")
    if T != it.shape[0]:
        raise ValueError(f"packed slab has {T} tiles but the walk "
                         f"table has {it.shape[0]}")
    if alq_slab.shape != ah_slab.shape:
        raise ValueError(f"quantized lo plane shape {alq_slab.shape} "
                         f"!= hi plane {ah_slab.shape}")
    if sc.shape != (T,):
        raise ValueError(f"scale table shape {sc.shape} != ({T},)")
    if ms is None or ms % tb:
        raise ValueError("packed slab needs ms (a multiple of tb)")
    a_map = lambda t, it_ref, kt_ref, lt_ref, sc_ref: (t, t * 0)
    grid = (T,)

    def tile_spec():
        return pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec((1, tb),
                            lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                            (t * 0, kt_ref[t]),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                            (it_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yd_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                            (lt_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yt_spec():
        return pl.BlockSpec((1, n),
                            lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                            (t * 0, t * 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[tile_spec(), tile_spec(), row_spec(), row_spec(),
                  col_spec(), col_spec()],
        out_specs=(yd_spec(), yd_spec(), yt_spec(), yt_spec()),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_dfq_symm_slab_kernel, comp=comp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), jnp.asarray(lt),
      jnp.asarray(sc), ah_slab, alq_slab,
      p_hi.reshape(1, n), p_lo.reshape(1, n),
      p_hi.reshape(n, 1), p_lo.reshape(n, 1))
    return (ydh.reshape(ms), ydl.reshape(ms),
            yth.reshape(n), ytl.reshape(n))


# ---------------------------------------------------------------------------
# DUAL gemv: (S @ p, S^T @ q) from ONE read of a dense rectangle
# ---------------------------------------------------------------------------
#
# The off-diagonal building block of the SYMMETRIC 2-D grid
# (lam_tpu/parallel/pcg2d_symm.py): chips (i, j) and (j, i) each hold
# one half-slab S of the lower block A_{max,min}; each computes BOTH the
# direct product S @ p (rows of its half) and the transpose product
# S^T @ q (columns -> the mirror block's rows) from a single pass over
# S, so every matrix element is stored once and read once per matvec
# across the mesh. The reference has no symmetric storage at all — its
# backends stream all N^2 elements every matvec
# (ConjugateGradient_GPU_CUDA.cu:171-211 and clones).
#
# Storage is the walk-order tile packing used by the packed symm
# kernels: block-row t of the (T*tb, tb) buffer is tile (t // cb,
# t % cb) of S (row-major rectangle walk, cb = n // tb); T may EXCEED
# the rectangle's tile count (mb * cb) — trailing pad tiles keep the
# per-chip buffer shape uniform with the diagonal chips' triangle
# buffers inside one shard_map operand and are never visited.


def _dual_geometry(buf, p, q, what):
    tb = buf.shape[1]
    n = p.shape[0]
    ms = q.shape[0]
    if tb < _LANES or tb & (tb - 1):
        raise ValueError(f"{what}: packed tile width {tb} must be a "
                         f"power-of-two multiple of {_LANES}")
    if n % tb or ms % tb or buf.shape[0] % tb:
        raise ValueError(f"{what}: n={n}, ms={ms} and packed rows "
                         f"{buf.shape[0]} must be multiples of tb={tb}")
    mb, cb = ms // tb, n // tb
    if buf.shape[0] // tb < mb * cb:
        raise ValueError(
            f"{what}: packed buffer has {buf.shape[0] // tb} tiles, "
            f"rectangle ({ms}, {n}) needs {mb * cb}")
    return tb, mb, cb


def _gemv_f32_dual_kernel(a_ref, p_ref, q_ref, yd_ref, yt_ref,
                          acc_d, acc_t):
    _dual_f32_step(a_ref[:], p_ref[:], q_ref[:], yd_ref, yt_ref,
                   acc_d, acc_t)


def _dual_f32_step(a, prow, qcol, yd_ref, yt_ref, acc_d, acc_t):
    """One rectangle-walk grid step of the f32 dual matvec — shared by
    the f32 kernel and the q16 kernel (a dequantized from an int16
    tile, the per-tile scale folded into prow/qcol by the caller)."""
    li = pl.program_id(0)
    k = pl.program_id(1)
    nli = pl.num_programs(0)
    nk = pl.num_programs(1)

    @pl.when(jnp.logical_and(li == 0, k == 0))
    def _():
        acc_t[:] = jnp.zeros_like(acc_t)

    @pl.when(k == 0)
    def _():
        acc_d[:] = jnp.zeros_like(acc_d)

    tb = a.shape[0]

    # direct: yd[li] += S_lik @ p_k (128 lane accumulators)
    acc_d[:] = _lane_fold(a * prow, acc_d[:])

    @pl.when(k == nk - 1)
    def _():
        yd_ref[:] = _lane_tree(acc_d[:])

    # transpose: yt[k] += S_lik^T @ q_li — EVERY tile (dense rectangle;
    # the symm kernels' k<i guard has no analog here)
    tpart = jnp.sum(a * qcol, axis=0, keepdims=True)  # (1, TB)
    idx = pl.dslice(k * tb, tb)
    acc_t[:, idx] = acc_t[:, idx] + tpart

    @pl.when(jnp.logical_and(li == nli - 1, k == nk - 1))
    def _():
        yt_ref[:] = acc_t[:]


@jax.jit
def gemv_f32_dual(buf, p, q):
    """(S @ p, S^T @ q) for a dense f32 rectangle S (ms, n) stored as
    the (T*tb, tb) row-major tile packing `buf` (T >= ms/tb * n/tb;
    trailing pad tiles unread). p: (n,), q: (ms,). One HBM pass."""
    tb, mb, cb = _dual_geometry(buf, p, q, "gemv_f32_dual")
    n = p.shape[0]
    ms = q.shape[0]
    grid = (mb, cb)
    yd, yt = pl.pallas_call(
        _gemv_f32_dual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), lambda li, k: (li * cb + k, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k: (li, li * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda li, k: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(buf, p.reshape(1, n), q.reshape(ms, 1))
    return yd.reshape(ms), yt.reshape(n)


def _gemv_df64_dual_kernel(ah_ref, al_ref, ph_ref, pl_ref, qh_ref,
                           ql_ref, ydh_ref, ydl_ref, yth_ref, ytl_ref,
                           accd_s, accd_c, acct_s, acct_c, *, comp):
    _dual_df64_step(ah_ref[:], al_ref[:], ph_ref, pl_ref, qh_ref,
                    ql_ref, ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


def _dual_df64_step(ah, al, ph_ref, pl_ref, qh_ref, ql_ref, ydh_ref,
                    ydl_ref, yth_ref, ytl_ref, accd_s, accd_c, acct_s,
                    acct_c, comp):
    """Shared compensated dual-product grid step — al read from the lo
    plane (df64) or dequantized from an int16 tile (dfq)."""
    li = pl.program_id(0)
    k = pl.program_id(1)
    nli = pl.num_programs(0)
    nk = pl.num_programs(1)

    @pl.when(jnp.logical_and(li == 0, k == 0))
    def _():
        acct_s[:] = jnp.zeros_like(acct_s)
        acct_c[:] = jnp.zeros_like(acct_c)

    @pl.when(k == 0)
    def _():
        accd_s[:] = jnp.zeros_like(accd_s)
        accd_c[:] = jnp.zeros_like(accd_c)

    tb = ah.shape[0]

    # direct: yd[li] += S_lik @ p_k (lane-compensated fold)
    t_hi, t_lo = _df64_exact_tile(ah, al, ph_ref[:], pl_ref[:], comp)
    s = accd_s[:]
    c = accd_c[:]
    for j in range(tb // _LANES):
        sl = slice(j * _LANES, (j + 1) * _LANES)
        s, e = two_sum(s, t_hi[:, sl])
        c = c + (e + t_lo[:, sl])
    accd_s[:] = s
    accd_c[:] = c

    @pl.when(k == nk - 1)
    def _():
        s_ = accd_s[:]
        c_ = accd_c[:]
        width = _LANES
        while width > 1:
            half = width // 2
            s2, e = two_sum(s_[:, :half], s_[:, half:width])
            c_ = c_[:, :half] + c_[:, half:width] + e
            s_ = s2
            width = half
        hi, lo = fast_two_sum(s_, c_)
        ydh_ref[:] = hi
        ydl_ref[:] = lo

    # transpose: yt[k] += S_lik^T @ q_li — every tile (dense rectangle)
    u_hi, u_lo = _df64_exact_tile(ah, al, qh_ref[:], ql_ref[:], comp)
    width = tb
    while width > _SYMM_T_SUBLANES:
        half = width // 2
        s2, e = two_sum(u_hi[:half], u_hi[half:width])
        u_lo = u_lo[:half] + u_lo[half:width] + e
        u_hi = s2
        width = half
    idx = pl.dslice(k * tb, tb)
    s2, e = two_sum(acct_s[:, idx], u_hi)
    acct_s[:, idx] = s2
    acct_c[:, idx] = acct_c[:, idx] + (e + u_lo)

    @pl.when(jnp.logical_and(li == nli - 1, k == nk - 1))
    def _():
        s_ = acct_s[:]
        c_ = acct_c[:]
        width = _SYMM_T_SUBLANES
        while width > 1:
            half = width // 2
            s2, e = two_sum(s_[:half], s_[half:width])
            c_ = c_[:half] + c_[half:width] + e
            s_ = s2
            width = half
        hi, lo = fast_two_sum(s_, c_)
        yth_ref[:] = hi
        ytl_ref[:] = lo


@functools.partial(jax.jit, static_argnames=("comp",))
def gemv_df64_dual(buf_hi, buf_lo, p_hi, p_lo, q_hi, q_lo, *, comp=None):
    """Float-float dual matvec: ((S@p)_hi, (S@p)_lo, (S^T@q)_hi,
    (S^T@q)_lo) for a dense rectangle S stored as the (T*tb, tb)
    row-major tile packing (see `gemv_f32_dual`), with the same
    compensated arithmetic as `gemv_df64_symm_slab`. The lo plane may
    be a single (tb, tb) zero tile (see _lo_plane_map)."""
    comp = _resolve_comp(comp)
    tb, mb, cb = _dual_geometry(buf_hi, p_hi, q_hi, "gemv_df64_dual")
    n = p_hi.shape[0]
    ms = q_hi.shape[0]
    a_map = lambda li, k: (li * cb + k, li * 0)
    if buf_lo.shape == buf_hi.shape:
        lo_map = a_map
    elif buf_lo.shape == (tb, tb):
        lo_map = lambda li, k: (li * 0, li * 0)
    else:
        raise ValueError(
            f"gemv_df64_dual: lo plane must match the hi plane "
            f"{buf_hi.shape} or be a single ({tb}, {tb}) broadcast "
            f"tile, got {buf_lo.shape}")
    grid = (mb, cb)
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_df64_dual_kernel, comp=comp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tb), lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k: (li, li * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda li, k: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(buf_hi, buf_lo, p_hi.reshape(1, n), p_lo.reshape(1, n),
      q_hi.reshape(ms, 1), q_lo.reshape(ms, 1))
    return (ydh.reshape(ms), ydl.reshape(ms),
            yth.reshape(n), ytl.reshape(n))


def _gemv_dfq_dual_kernel(sc_ref, ah_ref, alq_ref, ph_ref, pl_ref,
                          qh_ref, ql_ref, ydh_ref, ydl_ref, yth_ref,
                          ytl_ref, accd_s, accd_c, acct_s, acct_c, *,
                          comp, cb):
    # dequantize the int16 lo tile in VMEM (exact: power-of-two scale;
    # the per-tile scale arrives via scalar prefetch — Mosaic rejects
    # sub-(8,128) VMEM blocks)
    t = pl.program_id(0) * cb + pl.program_id(1)
    al = alq_ref[:].astype(jnp.float32) * sc_ref[t]
    _dual_df64_step(ah_ref[:], al, ph_ref, pl_ref, qh_ref, ql_ref,
                    ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


@functools.partial(jax.jit, static_argnames=("comp",))
def gemv_dfq_dual(buf_hi, buf_loq, sc, p_hi, p_lo, q_hi, q_lo, *,
                  comp=None):
    """Quantized-lo dual matvec — the dfq twin of `gemv_df64_dual`:
    S a dense rectangle stored as (T*tb, tb) row-major tile packing
    with the lo plane int16 against per-tile power-of-two scales
    (`sc`, one per tile in the same row-major order; trailing pad-tile
    scales unread). 6 B/element per shard; used by the symmetric 2-D
    grid's off-diagonal half-slabs (lam_tpu/parallel/pcg2d_symm.py)."""
    comp = _resolve_comp(comp)
    tb, mb, cb = _dual_geometry(buf_hi, p_hi, q_hi, "gemv_dfq_dual")
    n = p_hi.shape[0]
    ms = q_hi.shape[0]
    if buf_loq.shape != buf_hi.shape:
        raise ValueError(f"quantized lo plane shape {buf_loq.shape} != "
                         f"hi plane {buf_hi.shape}")
    T = buf_hi.shape[0] // tb
    if sc.shape != (T,):
        raise ValueError(f"scale table shape {sc.shape} != ({T},)")
    a_map = lambda li, k, sc_ref: (li * cb + k, li * 0)
    grid = (mb, cb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k, sc_ref: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k, sc_ref: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k, sc_ref: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k, sc_ref: (li, li * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda li, k, sc_ref: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k, sc_ref: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k, sc_ref: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k, sc_ref: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_dfq_dual_kernel, comp=comp, cb=cb),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(sc), buf_hi, buf_loq, p_hi.reshape(1, n),
      p_lo.reshape(1, n), q_hi.reshape(ms, 1), q_lo.reshape(ms, 1))
    return (ydh.reshape(ms), ydl.reshape(ms),
            yth.reshape(n), ytl.reshape(n))


def pack_rect_host(s, tb, pad_tiles=0):
    """Pack a dense host rectangle (ms, n) into the row-major (T*tb, tb)
    tile layout of the dual kernels, plus `pad_tiles` trailing zero
    tiles (shape uniformity with triangle buffers)."""
    import numpy as _np
    s = _np.asarray(s)
    ms, n = s.shape
    mb, cb = ms // tb, n // tb
    out = _np.zeros(((mb * cb + pad_tiles) * tb, tb), dtype=s.dtype)
    for li in range(mb):
        for k in range(cb):
            t = li * cb + k
            out[t * tb:(t + 1) * tb] = s[li * tb:(li + 1) * tb,
                                         k * tb:(k + 1) * tb]
    return out


# ---------------------------------------------------------------------------
# fq: FULLY-quantized packed symmetric storage — the 2-byte inner plane
# ---------------------------------------------------------------------------
#
# dfq (above) quantizes only the LO plane: the inner f32 CG still reads
# the 4-byte hi plane, and the inner loop is where ~95% of a mixed-
# precision solve's HBM bytes move. fq quantizes the WHOLE element as a
# cascade of THREE int16 planes against per-tile power-of-two scales:
#
#   A_tile  ~=  q1*s1  +  q2*s2  +  q3*s3,     s_{k+1} ~= s_k * 2^-16
#
# so the element is still 6 bytes (same capacity as dfq — the N=70000
# north-star still fits one 16 GB v5e) but the INNER matvec reads only
# the q1 plane: 2 B/element, HALF the dfq/ir inner bytes. Elementwise
# storage error <= s3/2 ~= 2^-48 * max|A_tile| — df64-pair class,
# strictly better than dfq's 2^-39.
#
# The inner operator error (~2^-16 tile-relative) costs refinement
# iterations: measured in the numpy feasibility study
# (scripts/fq_feasibility.py, N=4096 reference spectrum), 381 total
# inner iterations at inner_floor=1e-2 vs 363 for f32-inner ir (+5%) —
# against a 2x inner-byte cut. The diagonal is extracted exactly as a
# df64 pair and zeroed in the planes, as in dfq. The reference has no
# quantized storage at all — it streams 8-byte fp64 everywhere
# (ConjugateGradient_GPU_CUDA.cu:171-223).


def quantize_fq_tiles(a_packed, tb):
    """Quantize a packed (T*tb, tb) f64 buffer into the three-plane fq
    cascade. Returns (q1, q2, q3 int16 planes, s1, s2, s3 (T,) f32
    power-of-two scale tables). Reconstruction q*s is exact per plane;
    residual after plane k is bounded by s_k/2."""
    import numpy as _np
    r = _np.array(a_packed, dtype=_np.float64, copy=True)
    T = r.shape[0] // tb
    qs = []
    scs = []
    for _ in range(3):
        q = _np.zeros(r.shape, dtype=_np.int16)
        sc = _np.zeros((T,), dtype=_np.float32)
        for t in range(T):
            tile = r[t * tb:(t + 1) * tb]
            m = float(_np.abs(tile).max())
            if m == 0.0:
                continue
            scale = _pow2_scale(m)
            sc[t] = scale
            qt = _np.clip(_np.rint(tile / scale), -32767, 32767)
            q[t * tb:(t + 1) * tb] = qt
            tile -= qt * scale            # exact: power-of-two scale
        qs.append(q)
        scs.append(sc)
    return qs[0], qs[1], qs[2], scs[0], scs[1], scs[2]


def _gemv_q16_symm_kernel(it_ref, kt_ref, sc_ref, q_ref, prow_ref,
                          pcol_ref, yd_ref, yt_ref, acc_d, acc_t):
    t = pl.program_id(0)
    # dequantize in VMEM: int16 -> f32 convert per element; the per-tile
    # scale (exact power of two) is folded into the OPERAND VECTORS —
    # tb ops instead of tb^2 — because this kernel is dequantize-op
    # bound, not byte-bound (first hardware cut: scaling `a` ran at
    # 409 GB/s effective vs the f32 kernel's 667)
    a = q_ref[:].astype(jnp.float32)
    s = sc_ref[t]
    _symm_f32_step(it_ref[t], kt_ref[t], a, prow_ref[:] * s,
                   pcol_ref[:] * s, yd_ref, yt_ref, acc_d, acc_t)


def _gemv_q16_symm_multi_kernel(it_ref, kt_ref, sc_ref, q_ref, *rest,
                                P, tb, impl="vpu"):
    """P triangle-walk tiles per grid step over one (P*tb, tb) int16
    block — the round-4 form of the q16 step (_symm_f32_step unrolled
    P times with per-tile dynamic output slices). The larger contiguous
    DMA is the whole point: measured 600 GB/s vs 501 for the one-tile
    grid at N=114688 (results/Q16_PROBE2_r04.log).

    impl="mxu" (the default, LAM_Q16_IMPL): both per-tile terms as
    single-pass MXU dots at DEFAULT precision — measured AT the DMA
    floor (646 vs 598 GB/s VPU, results/Q16_PROBE4_r04.log). The MXU
    rounds both operands to bf16 (~2^-9 operator error vs the
    quantization's ~2^-16); the irfq refinement absorbs that almost
    for free — end-to-end at N=20000: 0.293 s vs 0.313 s, +6 inner
    iterations, identical true residual (scripts/q16_e2e.py,
    results/Q16_E2E_r04.log)."""
    pr_refs = rest[:P]
    pc_refs = rest[P:2 * P]
    yd_ref, yt_ref, acc_d, acc_t = rest[2 * P:]
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_t[:] = jnp.zeros_like(acc_t)

    for u in range(P):
        g = t * P + u
        i = it_ref[g]
        k = kt_ref[g]
        s = sc_ref[g]

        @pl.when(k == 0)
        def _():
            acc_d[:] = jnp.zeros_like(acc_d)

        a = q_ref[u * tb:(u + 1) * tb, :].astype(jnp.float32)
        if impl == "mxu":
            acc_d[:] = acc_d[:] + jax.lax.dot_general(
                a, pr_refs[u][:] * s,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (tb, 1)
        else:
            acc_d[:] = _lane_fold(a * (pr_refs[u][:] * s), acc_d[:])

        @pl.when(k == i)               # diagonal tile = last of row i
        def _():
            if impl == "mxu":
                yd_ref[pl.dslice(i * tb, tb), :] = acc_d[:]
            else:
                yd_ref[pl.dslice(i * tb, tb), :] = _lane_tree(acc_d[:])

        @pl.when(k < i)                # strictly-lower: transpose term
        def _():
            if impl == "mxu":
                w = jax.lax.dot_general(
                    pc_refs[u][:] * s, a,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (1, tb)
            else:
                w = a * (pc_refs[u][:] * s)
                width = tb
                while width > 1:       # same halving tree as _lane_tree,
                    half = width // 2  # over rows
                    w = w[:half] + w[half:width]
                    width = half
            idx = pl.dslice(k * tb, tb)
            acc_t[:, idx] = acc_t[:, idx] + w

    @pl.when(t == nt - 1)
    def _():
        yt_ref[:] = acc_t[:]


def _gemv_q16_symm_blocked(q1, sc1, p, tb, nblk, T):
    """The P-blocked grid of gemv_q16_symm (T % Q16_P == 0). Each grid
    step DMAs one (Q16_P*tb, tb) block and unrolls the walk step over
    its tiles; per-tile operand rows/columns arrive as Q16_P separately
    index-mapped (1, tb)/(tb, 1) views of p."""
    n = p.shape[0]
    P = Q16_P
    impl = _q16_impl(n)
    it, kt = (_symm_tables_padded(nblk)
              if T > tri_tile_count(nblk) else _symm_tables(nblk))
    grid = (T // P,)

    def pr_spec(u):
        return pl.BlockSpec(
            (1, tb),
            lambda t, it_ref, kt_ref, sc_ref, u=u: (t * 0,
                                                    kt_ref[t * P + u]),
            memory_space=pltpu.VMEM)

    def pc_spec(u):
        if impl == "mxu":  # row view: the MXU transpose term is
            return pl.BlockSpec(  # (1,tb)@(tb,tb) -> (1,tb)
                (1, tb),
                lambda t, it_ref, kt_ref, sc_ref, u=u: (t * 0,
                                                        it_ref[t * P + u]),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (tb, 1),
            lambda t, it_ref, kt_ref, sc_ref, u=u: (it_ref[t * P + u],
                                                    t * 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((P * tb, tb),
                          lambda t, it_ref, kt_ref, sc_ref: (t, t * 0),
                          memory_space=pltpu.VMEM)]
            + [pr_spec(u) for u in range(P)]
            + [pc_spec(u) for u in range(P)]
        ),
        out_specs=(
            pl.BlockSpec((n, 1),
                         lambda t, it_ref, kt_ref, sc_ref: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n),
                         lambda t, it_ref, kt_ref, sc_ref: (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, 1) if impl == "mxu" else (tb, _LANES),
                       jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    pc_view = (p.reshape(1, n) if impl == "mxu" else p.reshape(n, 1))
    yd, yt = pl.pallas_call(
        functools.partial(_gemv_q16_symm_multi_kernel, P=P, tb=tb,
                          impl=impl),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), sc1, q1,
      *([p.reshape(1, n)] * Q16_P), *([pc_view] * Q16_P))
    return yd.reshape(n) + yt.reshape(n)


@jax.jit
def gemv_q16_symm(q1, sc1, p):
    """y ~= A @ p for SYMMETRIC A stored as the q1 plane of the fq
    cascade (quantize_fq_tiles): int16 walk-order triangle tiles
    against per-tile power-of-two scales. 2 B/element — half the f32
    triangle's HBM bytes; ~2^-16 tile-relative operator error. This is
    the INNER engine of precision='irfq' (the refinement loop absorbs
    the error; lam_tpu/solver/cg.py cg_solve_ir).

    The plane may be EXACT (tri_tile_count(nblk) tiles) or PADDED to a
    multiple of Q16_P tiles (all-zero pad tiles, zero pad scales — the
    round-4 fq storage layout). Whenever the stored tile count is a
    multiple of Q16_P (and nblk >= 2), the blocked grid runs: one
    (Q16_P*tb, tb) DMA per step, 600 vs 501 GB/s measured at N=114688
    (results/Q16_PROBE2_r04.log)."""
    n = p.shape[0]
    tb, nblk, T = _packed_geometry(q1, p, "gemv_q16_symm")
    t_tri = tri_tile_count(nblk)
    t_pad = padded_tri_tile_count(nblk)
    if T not in (t_tri, t_pad):
        raise ValueError(
            f"packed buffer has {T} tiles, triangle of nblk={nblk} "
            f"needs {t_tri} (or {t_pad} padded)")
    if sc1.shape != (T,):
        raise ValueError(f"scale table shape {sc1.shape} != ({T},)")
    if T % Q16_P == 0 and nblk >= 2:
        return _gemv_q16_symm_blocked(q1, sc1, p, tb, nblk, T)
    # one-tile grid; on padded storage it simply never reads the pad
    # tiles (grid covers the first t_tri block-rows only)
    it, kt = _symm_tables(nblk)
    grid = (len(it),)
    a_map = lambda t, it_ref, kt_ref, sc_ref: (t, t * 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb),
                         lambda t, it_ref, kt_ref, sc_ref:
                         (t * 0, kt_ref[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref, sc_ref:
                         (it_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref, sc_ref:
                         (it_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n),
                         lambda t, it_ref, kt_ref, sc_ref:
                         (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    yd, yt = pl.pallas_call(
        _gemv_q16_symm_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), sc1, q1,
      p.reshape(1, n), p.reshape(n, 1))
    return yd.reshape(n) + yt.reshape(n)


def _gemv_fq_symm_kernel(it_ref, kt_ref, s1_ref, s2_ref, s3_ref,
                         q1_ref, q2_ref, q3_ref, prh_ref, prl_ref,
                         pch_ref, pcl_ref, ydh_ref, ydl_ref, yth_ref,
                         ytl_ref, accd_s, accd_c, acct_s, acct_c, *,
                         comp):
    t = pl.program_id(0)
    # dequantize all three planes (each exact: int16 -> f32 convert is
    # exact, power-of-two scales multiply exactly) and rebuild the
    # (ah, al) float-float pair with an unconditional EFT: two_sum is
    # required because a tiny element can have q1 == 0 while q2/q3
    # carry it (fast_two_sum's |a|>=|b| precondition does not hold
    # elementwise). See the findings ledger: only unconditional EFTs
    # survive end-to-end in these kernels.
    t1 = q1_ref[:].astype(jnp.float32) * s1_ref[t]
    t2 = q2_ref[:].astype(jnp.float32) * s2_ref[t]
    t3 = q3_ref[:].astype(jnp.float32) * s3_ref[t]
    ah, e = two_sum(t1, t2)
    al = e + t3
    _symm_df64_step(it_ref[t], kt_ref[t], t, pl.num_programs(0),
                    ah, al, prh_ref, prl_ref, pch_ref, pcl_ref,
                    ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


@functools.partial(jax.jit, static_argnames=("comp",))
def gemv_fq_symm(q1, q2, q3, s1, s2, s3, p_hi, p_lo, *, comp=None):
    """(y_hi, y_lo) = A @ p for SYMMETRIC A in fully-quantized packed
    storage (quantize_fq_tiles): three int16 walk-order triangle planes
    + per-tile power-of-two scales, 6 B/element, ~2^-48 tile-relative
    accuracy. Same compensated triangle walk as `gemv_dfq_symm`; the
    (ah, al) float-float pair is rebuilt in VMEM from the cascade."""
    comp = _resolve_comp(comp)
    n = p_hi.shape[0]
    tb, nblk, T = _packed_geometry(q1, p_hi, "gemv_fq_symm")
    if T not in (tri_tile_count(nblk), padded_tri_tile_count(nblk)):
        # padded planes (the round-4 fq layout, a multiple of Q16_P
        # tiles) are fine: this kernel's grid covers the real triangle
        # only, so the pad tiles are simply never read
        raise ValueError(
            f"packed buffer has {T} tiles, triangle of nblk={nblk} "
            f"needs {tri_tile_count(nblk)} "
            f"(or {padded_tri_tile_count(nblk)} padded)")
    for name, q in (("q2", q2), ("q3", q3)):
        # a (tb, tb) plane is ONE broadcast tile (gen-mode exact-zero
        # residual planes — same trick as the packed f32 engine's zero
        # lo tile); its index map pins block 0 for every grid step
        if q.shape != q1.shape and q.shape != (tb, tb):
            raise ValueError(f"{name} plane shape {q.shape} != q1 "
                             f"plane {q1.shape} (or one broadcast "
                             f"({tb}, {tb}) tile)")
    for name, s in (("s1", s1), ("s2", s2), ("s3", s3)):
        if s.shape != (T,):
            raise ValueError(f"{name} table shape {s.shape} != ({T},)")
    it, kt = _symm_tables(nblk)
    grid = (len(it),)
    a_map = lambda t, *refs: (t, t * 0)
    a_map0 = lambda t, *refs: (t * 0, t * 0)

    def tile_spec(q=None):
        bcast = q is not None and q.shape == (tb, tb) and T > 1
        return pl.BlockSpec((tb, tb), a_map0 if bcast else a_map,
                            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec(
            (1, tb),
            lambda t, it_ref, kt_ref, *refs: (t * 0, kt_ref[t]),
            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec(
            (tb, 1),
            lambda t, it_ref, kt_ref, *refs: (it_ref[t], t * 0),
            memory_space=pltpu.VMEM)

    def yd_spec():
        return pl.BlockSpec(
            (tb, 1),
            lambda t, it_ref, kt_ref, *refs: (it_ref[t], t * 0),
            memory_space=pltpu.VMEM)

    def yt_spec():
        return pl.BlockSpec(
            (1, n),
            lambda t, it_ref, kt_ref, *refs: (t * 0, t * 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[tile_spec(), tile_spec(q2), tile_spec(q3),
                  row_spec(), row_spec(), col_spec(), col_spec()],
        out_specs=(yd_spec(), yd_spec(), yt_spec(), yt_spec()),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_fq_symm_kernel, comp=comp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), s1, s2, s3, q1, q2, q3,
      p_hi.reshape(1, n), p_lo.reshape(1, n),
      p_hi.reshape(n, 1), p_lo.reshape(n, 1))
    s, e = two_sum(ydh.reshape(n), yth.reshape(n))
    lo = ydl.reshape(n) + ytl.reshape(n) + e
    return fast_two_sum(s, lo)


def _gemv_q16_symm_slab_kernel(it_ref, kt_ref, lt_ref, sc_ref, q_ref,
                               prow_ref, pcol_ref, yd_ref, yt_ref,
                               acc_d, acc_t, *, impl="vpu"):
    t = pl.program_id(0)
    # dequantize + fold the per-tile scale into the operand vectors
    # (see _gemv_q16_symm_kernel); lt_ref steers the yd index map only
    a = q_ref[:].astype(jnp.float32)
    s = sc_ref[t]
    if impl == "mxu":
        # single-pass MXU dots (same trade as the local blocked kernel,
        # results/Q16_PROBE4_r04.log / Q16_E2E_r04.log): pcol_ref is a
        # (1, tb) ROW view of p at block-row i here
        i = it_ref[t]
        k = kt_ref[t]
        nt = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            acc_t[:] = jnp.zeros_like(acc_t)

        @pl.when(k == 0)
        def _():
            acc_d[:] = jnp.zeros_like(acc_d)

        acc_d[:] = acc_d[:] + jax.lax.dot_general(
            a, prow_ref[:] * s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (tb, 1)

        @pl.when(k == i)
        def _():
            yd_ref[:] = acc_d[:]

        @pl.when(k < i)
        def _():
            tb = a.shape[0]
            w = jax.lax.dot_general(
                pcol_ref[:] * s, a,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (1, tb)
            idx = pl.dslice(k * tb, tb)
            acc_t[:, idx] = acc_t[:, idx] + w

        @pl.when(t == nt - 1)
        def _():
            yt_ref[:] = acc_t[:]
    else:
        _symm_f32_step(it_ref[t], kt_ref[t], a, prow_ref[:] * s,
                       pcol_ref[:] * s, yd_ref, yt_ref, acc_d, acc_t)


@functools.partial(jax.jit, static_argnames=("ms",))
def gemv_q16_symm_slab(q1_slab, sc1, p, it, kt, lt, *, ms):
    """Partial q16 matvec over a band-pair shard — the fq twin of
    `gemv_f32_symm_slab(packed=True)` (same it/kt/lt walk tables,
    lam_tpu/parallel/pcg_symm.py): the shard's triangle tiles as the
    int16 q1 plane of the fq cascade, 2 B/element read per inner
    iteration. Returns (yd (ms,), yt (n,)); the caller scatters yd to
    the owned bands, adds the diagonal term, and psums across shards."""
    n = p.shape[0]
    tb, _, T = _packed_geometry(q1_slab, p, "gemv_q16_symm_slab")
    if T != it.shape[0]:
        raise ValueError(f"packed slab has {T} tiles but the walk "
                         f"table has {it.shape[0]}")
    if sc1.shape != (T,):
        raise ValueError(f"scale table shape {sc1.shape} != ({T},)")
    if ms is None or ms % tb:
        raise ValueError("packed slab needs ms (a multiple of tb)")
    impl = _q16_impl(n)
    grid = (T,)
    a_map = lambda t, it_ref, kt_ref, lt_ref, sc_ref: (t, t * 0)
    if impl == "mxu":  # (1, tb) ROW view of p at block-row i: the MXU
        pc_spec = pl.BlockSpec(  # transpose term is (1,tb)@(tb,tb)
            (1, tb),
            lambda t, it_ref, kt_ref, lt_ref, sc_ref:
            (t * 0, it_ref[t]),
            memory_space=pltpu.VMEM)
        pc_view = p.reshape(1, n)
    else:
        pc_spec = pl.BlockSpec(
            (tb, 1),
            lambda t, it_ref, kt_ref, lt_ref, sc_ref:
            (it_ref[t], t * 0),
            memory_space=pltpu.VMEM)
        pc_view = p.reshape(n, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb),
                         lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                         (t * 0, kt_ref[t]),
                         memory_space=pltpu.VMEM),
            pc_spec,
        ],
        out_specs=(
            pl.BlockSpec((tb, 1),
                         lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                         (lt_ref[t], t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n),
                         lambda t, it_ref, kt_ref, lt_ref, sc_ref:
                         (t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, 1) if impl == "mxu" else (tb, _LANES),
                       jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    yd, yt = pl.pallas_call(
        functools.partial(_gemv_q16_symm_slab_kernel, impl=impl),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), jnp.asarray(lt),
      jnp.asarray(sc1), q1_slab, p.reshape(1, n), pc_view)
    return yd.reshape(ms), yt.reshape(n)


def _gemv_fq_symm_slab_kernel(it_ref, kt_ref, lt_ref, s1_ref, s2_ref,
                              s3_ref, q1_ref, q2_ref, q3_ref, prh_ref,
                              prl_ref, pch_ref, pcl_ref, ydh_ref,
                              ydl_ref, yth_ref, ytl_ref, accd_s, accd_c,
                              acct_s, acct_c, *, comp):
    t = pl.program_id(0)
    # rebuild the (ah, al) float-float pair from the int16 cascade
    # (unconditional two_sum — see _gemv_fq_symm_kernel), then run the
    # identical compensated slab walk step
    t1 = q1_ref[:].astype(jnp.float32) * s1_ref[t]
    t2 = q2_ref[:].astype(jnp.float32) * s2_ref[t]
    t3 = q3_ref[:].astype(jnp.float32) * s3_ref[t]
    ah, e = two_sum(t1, t2)
    al = e + t3
    _symm_df64_step(it_ref[t], kt_ref[t], t, pl.num_programs(0),
                    ah, al, prh_ref, prl_ref, pch_ref, pcl_ref,
                    ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


@functools.partial(jax.jit, static_argnames=("comp", "ms"))
def gemv_fq_symm_slab(q1, q2, q3, s1, s2, s3, p_hi, p_lo, it, kt, lt,
                      *, ms, comp=None):
    """Partial SYMMETRIC fully-quantized matvec over a band-pair shard —
    the fq twin of `gemv_dfq_symm_slab`: three int16 cascade planes +
    per-tile power-of-two scales, 6 B/element per shard at ~2^-48
    tile-relative accuracy. Returns ((ydh, ydl) over the slab's ms
    rows, (yth, ytl) full length); the diagonal term is NOT included
    (extracted as a slab-order df64 pair by the operator)."""
    comp = _resolve_comp(comp)
    n = p_hi.shape[0]
    tb, _, T = _packed_geometry(q1, p_hi, "gemv_fq_symm_slab")
    if T != it.shape[0]:
        raise ValueError(f"packed slab has {T} tiles but the walk "
                         f"table has {it.shape[0]}")
    for name, q in (("q2", q2), ("q3", q3)):
        # a (tb, tb) plane is ONE broadcast tile (gen-mode exact-zero
        # residual planes, same as gemv_fq_symm) — block-0-pinned map
        if q.shape != q1.shape and q.shape != (tb, tb):
            raise ValueError(f"{name} plane shape {q.shape} != q1 "
                             f"plane {q1.shape} (or one broadcast "
                             f"({tb}, {tb}) tile)")
    for name, s in (("s1", s1), ("s2", s2), ("s3", s3)):
        if s.shape != (T,):
            raise ValueError(f"{name} table shape {s.shape} != ({T},)")
    if ms is None or ms % tb:
        raise ValueError("packed slab needs ms (a multiple of tb)")
    grid = (T,)
    a_map = lambda t, *refs: (t, t * 0)
    a_map0 = lambda t, *refs: (t * 0, t * 0)

    def tile_spec(q=None):
        bcast = q is not None and q.shape == (tb, tb) and T > 1
        return pl.BlockSpec((tb, tb), a_map0 if bcast else a_map,
                            memory_space=pltpu.VMEM)

    def row_spec():
        return pl.BlockSpec((1, tb),
                            lambda t, it_ref, kt_ref, *refs:
                            (t * 0, kt_ref[t]),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref, *refs:
                            (it_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yd_spec():
        return pl.BlockSpec((tb, 1),
                            lambda t, it_ref, kt_ref, lt_ref, *refs:
                            (lt_ref[t], t * 0),
                            memory_space=pltpu.VMEM)

    def yt_spec():
        return pl.BlockSpec((1, n),
                            lambda t, *refs: (t * 0, t * 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[tile_spec(), tile_spec(q2), tile_spec(q3),
                  row_spec(), row_spec(), col_spec(), col_spec()],
        out_specs=(yd_spec(), yd_spec(), yt_spec(), yt_spec()),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_fq_symm_slab_kernel, comp=comp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(it), jnp.asarray(kt), jnp.asarray(lt),
      jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(s3),
      q1, q2, q3, p_hi.reshape(1, n), p_lo.reshape(1, n),
      p_hi.reshape(n, 1), p_lo.reshape(n, 1))
    return (ydh.reshape(ms), ydl.reshape(ms),
            yth.reshape(n), ytl.reshape(n))


def _gemv_q16_dual_kernel(sc_ref, q_ref, p_ref, qc_ref, yd_ref, yt_ref,
                          acc_d, acc_t, *, cb, impl="vpu"):
    # dequantize the int16 tile; fold the per-tile scale into the
    # operand vectors (tb ops, not tb^2 — see _gemv_q16_symm_kernel)
    t = pl.program_id(0) * cb + pl.program_id(1)
    a = q_ref[:].astype(jnp.float32)
    s = sc_ref[t]
    if impl == "mxu":
        # single-pass MXU dots (results/Q16_PROBE4_r04.log trade);
        # qc_ref is a (1, tb) ROW view of q at block-row li here
        li = pl.program_id(0)
        k = pl.program_id(1)
        nli = pl.num_programs(0)
        nk = pl.num_programs(1)

        @pl.when(jnp.logical_and(li == 0, k == 0))
        def _():
            acc_t[:] = jnp.zeros_like(acc_t)

        @pl.when(k == 0)
        def _():
            acc_d[:] = jnp.zeros_like(acc_d)

        acc_d[:] = acc_d[:] + jax.lax.dot_general(
            a, p_ref[:] * s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (tb, 1)

        @pl.when(k == nk - 1)
        def _():
            yd_ref[:] = acc_d[:]

        tb = a.shape[0]
        w = jax.lax.dot_general(
            qc_ref[:] * s, a,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (1, tb)
        idx = pl.dslice(k * tb, tb)
        acc_t[:, idx] = acc_t[:, idx] + w

        @pl.when(jnp.logical_and(li == nli - 1, k == nk - 1))
        def _():
            yt_ref[:] = acc_t[:]
    else:
        _dual_f32_step(a, p_ref[:] * s, qc_ref[:] * s, yd_ref, yt_ref,
                       acc_d, acc_t)


@jax.jit
def gemv_q16_dual(q1buf, sc, p, q):
    """(S @ p, S^T @ q) for a dense rectangle S stored as the int16 q1
    plane of the fq cascade (row-major tile packing, per-tile
    power-of-two scales; trailing pad-tile scales unread) — the inner
    engine of the symmetric 2-D grid's off-diagonal half-slabs under
    precision='irfq': 2 B/element per pass."""
    tb, mb, cb = _dual_geometry(q1buf, p, q, "gemv_q16_dual")
    n = p.shape[0]
    ms = q.shape[0]
    # threshold on the larger extent: the half-slab's operands are
    # per-chip slices of the global vectors, and below the threshold
    # the MXU gains nothing while the bf16 rounding costs cycles
    impl = _q16_impl(max(n, ms))
    T = q1buf.shape[0] // tb
    if sc.shape != (T,):
        raise ValueError(f"scale table shape {sc.shape} != ({T},)")
    a_map = lambda li, k, sc_ref: (li * cb + k, li * 0)
    grid = (mb, cb)
    if impl == "mxu":  # (1, tb) ROW view of q at block-row li
        qc_spec = pl.BlockSpec((1, tb),
                               lambda li, k, sc_ref: (li * 0, li),
                               memory_space=pltpu.VMEM)
        qc_view = q.reshape(1, ms)
    else:
        qc_spec = pl.BlockSpec((tb, 1),
                               lambda li, k, sc_ref: (li, li * 0),
                               memory_space=pltpu.VMEM)
        qc_view = q.reshape(ms, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tb), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k, sc_ref: (k * 0, k),
                         memory_space=pltpu.VMEM),
            qc_spec,
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda li, k, sc_ref: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k, sc_ref: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, 1) if impl == "mxu" else (tb, _LANES),
                       jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    yd, yt = pl.pallas_call(
        functools.partial(_gemv_q16_dual_kernel, cb=cb, impl=impl),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(sc), q1buf, p.reshape(1, n), qc_view)
    return yd.reshape(ms), yt.reshape(n)


def _gemv_fq_dual_kernel(s1_ref, s2_ref, s3_ref, q1_ref, q2_ref,
                         q3_ref, ph_ref, pl_ref, qh_ref, ql_ref,
                         ydh_ref, ydl_ref, yth_ref, ytl_ref, accd_s,
                         accd_c, acct_s, acct_c, *, comp, cb):
    # rebuild the (ah, al) float-float pair from the int16 cascade
    # (unconditional two_sum — see _gemv_fq_symm_kernel)
    t = pl.program_id(0) * cb + pl.program_id(1)
    t1 = q1_ref[:].astype(jnp.float32) * s1_ref[t]
    t2 = q2_ref[:].astype(jnp.float32) * s2_ref[t]
    t3 = q3_ref[:].astype(jnp.float32) * s3_ref[t]
    ah, e = two_sum(t1, t2)
    al = e + t3
    _dual_df64_step(ah, al, ph_ref, pl_ref, qh_ref, ql_ref,
                    ydh_ref, ydl_ref, yth_ref, ytl_ref,
                    accd_s, accd_c, acct_s, acct_c, comp)


@functools.partial(jax.jit, static_argnames=("comp",))
def gemv_fq_dual(q1, q2, q3, s1, s2, s3, p_hi, p_lo, q_hi, q_lo, *,
                 comp=None):
    """Fully-quantized dual matvec — the fq twin of `gemv_dfq_dual`:
    S a dense rectangle stored as the three-int16 cascade (row-major
    tile packing, per-tile power-of-two scales, 6 B/element,
    ~2^-48 tile-relative accuracy; trailing pad-tile scales unread).
    The accurate engine of the symmetric 2-D grid's off-diagonal
    half-slabs under precision='fq'/'irfq'."""
    comp = _resolve_comp(comp)
    tb, mb, cb = _dual_geometry(q1, p_hi, q_hi, "gemv_fq_dual")
    n = p_hi.shape[0]
    ms = q_hi.shape[0]
    for name, qq in (("q2", q2), ("q3", q3)):
        # a (tb, tb) plane is ONE broadcast tile (gen-mode exact-zero
        # residual planes, Symm2DOperator.from_gen_fq — same trick as
        # gemv_fq_symm); its index map pins block 0 every grid step
        if (qq.shape != q1.shape
                and (qq.shape != (tb, tb) or q1.shape == (tb, tb))):
            raise ValueError(f"{name} plane shape {qq.shape} != q1 "
                             f"plane {q1.shape} (or one broadcast "
                             f"({tb}, {tb}) tile)")
    T = q1.shape[0] // tb
    for name, s in (("s1", s1), ("s2", s2), ("s3", s3)):
        if s.shape != (T,):
            raise ValueError(f"{name} table shape {s.shape} != ({T},)")
    a_map = lambda li, k, *refs: (li * cb + k, li * 0)
    a_map0 = lambda li, k, *refs: (li * 0, li * 0)

    def plane_spec(qq=None):
        bcast = qq is not None and qq.shape != q1.shape
        return pl.BlockSpec((tb, tb), a_map0 if bcast else a_map,
                            memory_space=pltpu.VMEM)

    grid = (mb, cb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            plane_spec(),
            plane_spec(q2),
            plane_spec(q3),
            pl.BlockSpec((1, tb), lambda li, k, *refs: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda li, k, *refs: (k * 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k, *refs: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k, *refs: (li, li * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda li, k, *refs: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda li, k, *refs: (li, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k, *refs: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda li, k, *refs: (li * 0, li * 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((tb, _LANES), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
            pltpu.VMEM((_SYMM_T_SUBLANES, n), jnp.float32),
        ],
    )
    ydh, ydl, yth, ytl = pl.pallas_call(
        functools.partial(_gemv_fq_dual_kernel, comp=comp, cb=cb),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((ms, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP),
        interpret=_use_interpret(),
    )(jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(s3), q1, q2, q3,
      p_hi.reshape(1, n), p_lo.reshape(1, n),
      q_hi.reshape(ms, 1), q_lo.reshape(ms, 1))
    return (ydh.reshape(ms), ydl.reshape(ms),
            yth.reshape(n), ytl.reshape(n))
