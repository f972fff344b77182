"""Binary matrix/vector file format, byte-compatible with the reference.

Format (written by the reference generator at random_spd_system.cpp:105-121
and read by every backend, e.g. ConjugateGradient_CPU_OMP.hpp:138-197):

    uint64 num_rows   (little-endian size_t)
    uint64 num_cols
    float64 data[num_rows * num_cols]   (row-major)

A file written by the reference loads here bit-exactly and vice versa.
Notes on deliberate divergences from reference bugs (SURVEY.md §8):
  * the reference's save_result_to_file writes an `int` with
    sizeof(size_t) for num_cols (ConjugateGradient_CPU_OMP.hpp:208-210) —
    works only on little-endian with the adjacent zero bytes; we write a
    genuine uint64.
  * the CPU-MPI backend saves the RHS instead of the solution
    (ConjugateGradient_CPU_MPI_OMP.hpp:436-439); we save the solution.

A threaded C++ loader (native/lam_native.cpp) accelerates large reads and
the f64 -> (hi, lo) f32 split; this module falls back to numpy when the
native library is not built.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_HEADER = struct.Struct("<QQ")


def _is_npy(path):
    return str(path).endswith(".npy")


def _open_npy(path):
    """Memory-map a .npy as a 2-D f64 array ((n,) vectors view as
    (n, 1) columns, matching how the reference format stores them).

    .npy is accepted everywhere the reference binary format is (round
    5): the benchmark system caches are .npy (bench.py, io/bench/), and
    routing them through the SAME read paths lets lam-bench and lam-cg
    reuse them — including the pack caches published beside the file."""
    a = np.load(path, mmap_mode="r")
    if a.dtype != np.float64:
        raise ValueError(f"{path}: expected float64 .npy, got {a.dtype}")
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    if a.ndim != 2:
        raise ValueError(f"{path}: expected a 1-D/2-D .npy, got "
                         f"{a.ndim}-D")
    return a


def read_header(path):
    """Return (num_rows, num_cols) from a reference-format binary file
    (or a .npy file's shape — see _open_npy).

    Raises IOError with a one-line message on a short/corrupt header —
    the CLI converts these to the reference's clean stderr-and-exit
    behavior (ConjugateGradient_CPU_MPI_OMP.hpp:325-329) instead of a
    traceback."""
    if _is_npy(path):
        a = _open_npy(path)
        return a.shape
    with open(path, "rb") as f:
        head = f.read(_HEADER.size)
    if len(head) != _HEADER.size:
        raise IOError(f"{path}: not a LAM binary file (header is "
                      f"{len(head)} bytes, need {_HEADER.size})")
    rows, cols = _HEADER.unpack(head)
    if rows == 0 or cols == 0 or rows * cols > (1 << 48):
        raise IOError(f"{path}: implausible header ({rows}x{cols}) — "
                      f"corrupt or not a LAM binary file")
    return rows, cols


def read_matrix(path, dtype=np.float64):
    """Read a full matrix (or column vector) into a numpy array.

    Mirrors load_matrix_from_file (ConjugateGradient_CPU_OMP.hpp:138-197)
    but returns shape (rows, cols); vectors come back as (rows, 1).
    """
    rows, cols = read_header(path)
    if _is_npy(path):
        return np.ascontiguousarray(
            np.asarray(_open_npy(path)).astype(dtype, copy=False))
    native = _native()
    if native is not None and dtype == np.float64:
        return native.read_rows(path, 0, rows, cols)
    data = np.fromfile(path, dtype=np.float64, count=rows * cols,
                       offset=_HEADER.size)
    if data.size != rows * cols:
        raise IOError(f"{path}: truncated payload "
                      f"({data.size} of {rows * cols} elements)")
    return np.ascontiguousarray(data.reshape(rows, cols).astype(dtype, copy=False))


def read_vector(path, dtype=np.float64):
    """Read an (N, 1) file as a 1-D vector, validating cols == 1.

    Mirrors load_rhs_from_file (ConjugateGradient_CPU_OMP.hpp:94-135).
    """
    rows, cols = read_header(path)
    if cols != 1:
        raise ValueError(f"{path}: not a vector (cols={cols})")
    return read_matrix(path, dtype=dtype).reshape(rows)


def read_matrix_rows(path, row_start, num_rows, dtype=np.float64):
    """Read a row-block [row_start, row_start+num_rows) of a matrix file.

    The sharded-loading analog of the reference's MPI-IO per-rank seek+read
    (ConjugateGradient_CPU_MPI_OMP.hpp:325-363): each host reads only its
    block of the row-sharded matrix.
    """
    rows, cols = read_header(path)
    if row_start + num_rows > rows:
        raise ValueError(f"row block [{row_start}, {row_start + num_rows}) "
                         f"out of range for {rows}-row matrix")
    if _is_npy(path):
        mm = _open_npy(path)
        return np.ascontiguousarray(
            np.array(mm[row_start:row_start + num_rows]).astype(
                dtype, copy=False))
    native = _native()
    if native is not None and dtype == np.float64:
        return native.read_rows(path, row_start, num_rows, cols)
    offset = _HEADER.size + row_start * cols * 8
    data = np.fromfile(path, dtype=np.float64, count=num_rows * cols,
                       offset=offset)
    if data.size != num_rows * cols:
        raise IOError(f"{path}: truncated payload "
                      f"({data.size} of {num_rows * cols} elements in "
                      f"row block [{row_start}, {row_start + num_rows}))")
    return np.ascontiguousarray(
        data.reshape(num_rows, cols).astype(dtype, copy=False))


def read_matrix_block(path, row_start, col_start, num_rows, num_cols,
                      dtype=np.float64):
    """Read a (num_rows, num_cols) block at (row_start, col_start).

    Column-windowed 2-D analog of `read_matrix_rows` for the 2-D sharded
    operator: reads only the block's bytes (per-row window via memmap,
    the same access pattern as the reference's per-rank MPI-IO seeks,
    ConjugateGradient_CPU_MPI_OMP.hpp:325-363) instead of reading full
    rows and slicing — full-row reads would amplify I/O by R x on an
    R x R grid, exactly the pod-scale path this serves.
    """
    rows, cols = read_header(path)
    if row_start + num_rows > rows or col_start + num_cols > cols:
        raise ValueError(
            f"block [{row_start}:{row_start + num_rows}, "
            f"{col_start}:{col_start + num_cols}) out of range for "
            f"{rows}x{cols} matrix")
    mm = (_open_npy(path) if _is_npy(path) else
          np.memmap(path, dtype=np.float64, mode="r",
                    offset=_HEADER.size, shape=(rows, cols)))
    block = np.array(mm[row_start:row_start + num_rows,
                        col_start:col_start + num_cols])
    del mm
    return np.ascontiguousarray(block.astype(dtype, copy=False))


def write_matrix(path, array):
    """Write a matrix/vector in the reference binary format.

    Byte-compatible with write_matrix_to_file (random_spd_system.cpp:105-121).
    1-D arrays are written as (N, 1) column vectors, matching how the
    reference stores rhs and solution files.
    """
    a = np.asarray(array, dtype=np.float64)
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    if a.ndim != 2:
        raise ValueError(f"expected 1-D or 2-D array, got shape {a.shape}")
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_HEADER.pack(a.shape[0], a.shape[1]))
        np.ascontiguousarray(a).tofile(f)


_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """Lazily load the optional C++ fast-IO library (native/)."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        if not os.environ.get("LAM_TPU_NO_NATIVE"):
            try:
                from lam_tpu import _native_io
                _NATIVE = _native_io if _native_io.available() else None
            except Exception:
                _NATIVE = None
    return _NATIVE
