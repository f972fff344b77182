"""Binary format: byte-compatibility with the reference's fwrite layout."""

import struct

import numpy as np
import pytest

from lam_tpu import io as lio


def _reference_style_bytes(a):
    """Bytes exactly as the reference writes them
    (random_spd_system.cpp:105-121): two size_t + row-major doubles."""
    a = np.asarray(a, dtype="<f8")
    return struct.pack("<QQ", a.shape[0], a.shape[1]) + a.tobytes(order="C")


def test_roundtrip_matrix(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 5))
    path = tmp_path / "m.bin"
    lio.write_matrix(path, a)
    back = lio.read_matrix(path)
    np.testing.assert_array_equal(back, a)
    # byte-identical to what the reference's fwrite sequence produces
    assert path.read_bytes() == _reference_style_bytes(a)


def test_read_reference_written_file(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((9, 9))
    path = tmp_path / "ref.bin"
    path.write_bytes(_reference_style_bytes(a))
    np.testing.assert_array_equal(lio.read_matrix(path), a)
    assert lio.read_header(path) == (9, 9)


def test_vector_roundtrip(tmp_path):
    b = np.arange(11, dtype=np.float64)
    path = tmp_path / "v.bin"
    lio.write_matrix(path, b)  # 1-D -> (N, 1) like the reference rhs files
    assert lio.read_header(path) == (11, 1)
    np.testing.assert_array_equal(lio.read_vector(path), b)


def test_read_vector_rejects_matrix(tmp_path):
    path = tmp_path / "m.bin"
    lio.write_matrix(path, np.zeros((3, 3)))
    with pytest.raises(ValueError):
        lio.read_vector(path)


def test_row_block_read(tmp_path):
    rng = np.random.default_rng(2)
    a = rng.standard_normal((16, 4))
    path = tmp_path / "m.bin"
    lio.write_matrix(path, a)
    blk = lio.read_matrix_rows(path, 5, 7)
    np.testing.assert_array_equal(blk, a[5:12])
    with pytest.raises(ValueError):
        lio.read_matrix_rows(path, 10, 7)


def test_column_windowed_block_read(tmp_path):
    """2-D shard loads read only their block (no full-row R x I/O
    amplification) — the MPI-IO per-rank-window analog."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((12, 10))
    path = tmp_path / "m.bin"
    lio.write_matrix(path, a)
    blk = lio.read_matrix_block(path, 3, 4, 5, 6)
    np.testing.assert_array_equal(blk, a[3:8, 4:10])
    assert blk.flags["C_CONTIGUOUS"]
    with pytest.raises(ValueError):
        lio.read_matrix_block(path, 3, 6, 5, 6)  # cols out of range
    with pytest.raises(ValueError):
        lio.read_matrix_block(path, 9, 0, 5, 6)  # rows out of range


def test_npy_paths_read_like_reference_format(tmp_path):
    """.npy files are accepted everywhere the reference binary format
    is (round 5): the benchmark system caches are .npy and route
    through the SAME readers, so lam-cg/lam-bench can consume them
    (including the pack caches published beside the file)."""
    rng = np.random.default_rng(4)
    a = rng.standard_normal((12, 12))
    path = tmp_path / "m.npy"
    np.save(path, a)
    assert tuple(lio.read_header(path)) == (12, 12)
    np.testing.assert_array_equal(lio.read_matrix(path), a)
    np.testing.assert_array_equal(lio.read_matrix_rows(path, 5, 4),
                                  a[5:9])
    np.testing.assert_array_equal(
        lio.read_matrix_block(path, 3, 4, 5, 6), a[3:8, 4:10])
    # 1-D .npy vectors view as (n, 1) columns like the binary format
    v = rng.standard_normal(9)
    vpath = tmp_path / "v.npy"
    np.save(vpath, v)
    assert tuple(lio.read_header(vpath)) == (9, 1)
    np.testing.assert_array_equal(lio.read_vector(vpath), v)
    # non-f64 .npy fails loudly, not with a garbage matrix
    badpath = tmp_path / "bad.npy"
    np.save(badpath, a.astype(np.float32))
    with pytest.raises(ValueError, match="float64"):
        lio.read_matrix(badpath)
