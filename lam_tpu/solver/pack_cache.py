"""On-disk cache of packed quantized-triangle planes.

Packing a multi-GB f64 matrix file into the dfq/fq triangle layouts is
CPU-bound on this class of host (single-core quantization of N^2/2
elements dominated the measured N=70000 fq load: ~550 s of the 856 s
total; the other ~300 s is the 39 GB disk read at ~132 MB/s). The
packed planes are 3-8x SMALLER than the source file (6 B/element on
the lower triangle vs 8 B/element on the full square), so caching them
beside the source turns every RELOAD into a raw sequential read of the
small file — no quantization pass, ~7x faster measured at N=70000.

The same mechanism covers the UNQUANTIZED packed-triangle planes
(precision "f32": one f32 plane; "df64": the (hi, lo) f32 pair,
diagonal kept in-plane — the layouts of DenseOperator.from_dense with
engine='pallas_symm_packed'): their host-side f64->f32 conversion is
cheaper than quantization but the conversion + full-square read still
dominated measured loads (results/MERGE_TPU_FP.txt N=50000
load_s=719 s), and the f32 cache is 4x smaller than the source.

File format (version 2, little-endian):
    8 bytes   magic b"LAMPACK2"
    6 x u64   precision code (1=dfq, 2=fq, 3=f32, 4=df64), n,
              n_padded, tb, source file size, source file mtime_ns
    raw buffers in the operand order of _native_io.pack_{dfq,fq}
      dfq: hi (T*tb, tb) f32 | loq (T*tb, tb) i16 | sc (T,) f32
           | dh (n_p,) f32 | dl (n_p,) f32
      fq:  q1, q2, q3 (Tq*tb, tb) i16 | s1, s2, s3 (Tq,) f32
           | dh, dl (n_p,) f32
      f32: hi (T*tb, tb) f32
      df64: hi (T*tb, tb) f32 | lo (T*tb, tb) f32
with T = tri_tile_count(n_padded/tb) and Tq = padded_tri_tile_count
(T rounded up to a multiple of Q16_P — the round-4 fq layout change
that bumped the magic from LAMPACK1: fq planes carry all-zero pad
tiles so the blocked q16 grid applies, ops/gemv.py gemv_q16_symm).
All shapes are derivable from (precision, n_padded, tb), so the header
carries no per-buffer metadata. The source (size, mtime_ns) pair makes
the cache self-invalidating: a rewritten matrix file is repacked, not
served stale. Loads never raise on a bad cache — any mismatch or
truncation returns None and the caller repacks (and overwrites).

INVARIANT — bump the magic on ANY layout or quantizer change: the
header keys only (precision code, shapes, source size+mtime), so a
change to the pack pipeline that alters the BYTES it produces for the
same source (e.g. _pow2_scale rounding, plane ordering, tile walk
order) would silently serve packs built by the old algorithm. Any such
change MUST rev the magic (LAMPACK1 -> LAMPACK2), which invalidates
every existing cache file at load time.

The reference has no analog (it re-reads the raw fp64 file every run,
MPI-IO at challenge/main/LAM/src/CPU/ConjugateGradient_CPU_MPI_OMP.hpp:325-363);
this is the TPU-era answer to the same "load dominates at scale"
problem its read_time CSV column measures.
"""

import os

import numpy as np

MAGIC = b"LAMPACK2"
_PREC_CODE = {"dfq": 1, "fq": 2, "f32": 3, "df64": 4}
_HEADER_WORDS = 6


def cache_path(src_path, precision):
    """Cache file published beside the source matrix file."""
    return f"{src_path}.{precision}pack"


def _buffer_specs(precision, n_padded, tb):
    """(dtype, shape) per buffer, in operand order."""
    from lam_tpu.ops.gemv import padded_tri_tile_count
    nblk = n_padded // tb
    T = nblk * (nblk + 1) // 2
    plane = (T * tb, tb)
    scale = (T,)
    diag = (n_padded,)
    if precision == "dfq":
        return [(np.float32, plane), (np.int16, plane),
                (np.float32, scale), (np.float32, diag),
                (np.float32, diag)]
    if precision == "fq":
        tq = padded_tri_tile_count(nblk)
        return ([(np.int16, (tq * tb, tb))] * 3
                + [(np.float32, (tq,))] * 3
                + [(np.float32, diag)] * 2)
    if precision == "f32":
        return [(np.float32, plane)]
    if precision == "df64":
        return [(np.float32, plane)] * 2
    raise ValueError(f"unknown packed precision {precision!r}")


def save(src_path, precision, n, n_padded, tb, bufs, src_stat=None):
    """Atomically publish the packed buffers beside `src_path`.

    Best-effort: a full disk or read-only directory must not fail the
    solve that triggered the caching — errors clean up the temp file
    and return False.

    `src_stat` is the os.stat of the source taken BEFORE the pack ran
    (packing a multi-GB file takes minutes). The cache is tagged with
    that pre-pack (size, mtime_ns), and if the source's CURRENT stat
    no longer matches it the save is refused: the packed planes may
    mix old and new content (the pack reads a live memory map), and
    tagging them with the new file's identity would defeat the
    self-invalidation contract — every later load would silently serve
    a wrong operator."""
    dst = cache_path(src_path, precision)
    tmp = dst + ".tmp"
    try:
        st = os.stat(src_path)
        if src_stat is not None:
            if (st.st_size != src_stat.st_size
                    or st.st_mtime_ns != src_stat.st_mtime_ns):
                return False  # source rewritten mid-pack
            st = src_stat
        header = np.array(
            [_PREC_CODE[precision], n, n_padded, tb, st.st_size,
             st.st_mtime_ns], dtype="<u8")
        with open(tmp, "wb") as fh:
            fh.write(MAGIC)
            header.tofile(fh)
            for buf in bufs:
                np.ascontiguousarray(buf).tofile(fh)
        os.replace(tmp, dst)
        return True
    except OSError:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def load(src_path, precision):
    """Packed buffers from the cache beside `src_path`, or None.

    None means "no usable cache" (missing, stale vs the source file's
    (size, mtime_ns), truncated, or wrong precision/format) — the
    caller falls through to a fresh pack."""
    path = cache_path(src_path, precision)
    try:
        src_st = os.stat(src_path)
        with open(path, "rb") as fh:
            if fh.read(len(MAGIC)) != MAGIC:
                return None
            header = np.fromfile(fh, dtype="<u8", count=_HEADER_WORDS)
            if header.size != _HEADER_WORDS:
                return None
            code, n, n_padded, tb, src_size, src_mtime = (
                int(v) for v in header)
            if (code != _PREC_CODE[precision] or tb == 0
                    or n_padded % tb != 0 or n > n_padded
                    or src_size != src_st.st_size
                    or src_mtime != src_st.st_mtime_ns):
                return None
            specs = _buffer_specs(precision, n_padded, tb)
            # size check BEFORE any fromfile: a corrupt-but-magic-valid
            # header could otherwise demand an absurd upfront
            # allocation (np.fromfile allocates `count` elements first)
            expect = sum(int(np.prod(s)) * np.dtype(d).itemsize
                         for d, s in specs)
            payload = os.fstat(fh.fileno()).st_size - fh.tell()
            if payload != expect:
                return None  # truncated, padded, or corrupt-header cache
            bufs = []
            for dtype, shape in specs:
                count = int(np.prod(shape))
                buf = np.fromfile(fh, dtype=dtype, count=count)
                if buf.size != count:
                    return None
                bufs.append(buf.reshape(shape))
        return n, n_padded, tb, tuple(bufs)
    except (OSError, ValueError):
        return None
