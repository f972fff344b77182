"""Chunked host->device transfer (the round-5 load-wall lever)."""

import numpy as np
import pytest

from lam_tpu.ops import transfer


@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.float64])
def test_to_device_chunked_bit_identical(dtype):
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((37, 129)) * 100).astype(dtype)
    # force many chunks (one row per chunk region)
    got = transfer.to_device(a, chunk_bytes=129 * a.itemsize * 3)
    np.testing.assert_array_equal(np.asarray(got), a)
    assert got.dtype == a.dtype


def test_to_device_small_passthrough():
    a = np.arange(10, dtype=np.float32)
    got = transfer.to_device(a)
    np.testing.assert_array_equal(np.asarray(got), a)


def test_stream_file_to_device(tmp_path):
    rng = np.random.default_rng(1)
    pre = b"HDR!" * 5                       # 20-byte prefix
    a = (rng.standard_normal((41, 64)) * 7).astype(np.float32)
    tail = b"tail"
    p = tmp_path / "planes.bin"
    p.write_bytes(pre + a.tobytes() + tail)
    got = transfer.stream_file_to_device(
        str(p), len(pre), np.float32, (41, 64),
        chunk_bytes=64 * 4 * 7)             # 7-row chunks, ragged tail
    np.testing.assert_array_equal(np.asarray(got), a)


def test_stream_file_to_device_short_read(tmp_path):
    p = tmp_path / "short.bin"
    p.write_bytes(np.zeros(100, np.float32).tobytes())
    with pytest.raises(IOError, match="short read"):
        transfer.stream_file_to_device(str(p), 0, np.float32, (300, 1),
                                       chunk_bytes=4 * 50)


def test_pack_cache_load_device_matches_load(tmp_path):
    from lam_tpu import generate as gen
    from lam_tpu.solver import pack_cache as pc
    from lam_tpu.solver.operators import DenseOperator

    a = gen.random_spd_matrix(96, seed=4)
    src = tmp_path / "m.npy"
    np.save(src, a)
    # publish a cache by building once
    DenseOperator.from_file_fq(str(src), pack_cache=True)
    host = pc.load(str(src), "fq")
    dev = pc.load_device(str(src), "fq")
    assert host is not None and dev is not None
    assert host[:3] == dev[:3]
    for hb, db in zip(host[3], dev[3]):
        np.testing.assert_array_equal(np.asarray(db), hb)
    # both miss identically on a stale cache
    np.save(src, a + 1e-3)
    assert pc.load(str(src), "fq") is None
    assert pc.load_device(str(src), "fq") is None


def test_folder_incremental_equals_direct():
    rng = np.random.default_rng(2)
    a = (rng.standard_normal((100, 32)) * 50).astype(np.int16)
    f = transfer.Folder(a.shape, a.dtype, chunk_bytes=32 * 2 * 16)
    host = np.zeros_like(a)
    for avail in (10, 17, 40, 40, 77, 100):
        host[: avail] = a[: avail]
        f.advance(host, avail)
    np.testing.assert_array_equal(np.asarray(f.result()), a)
    # unfinished folder refuses to hand out a partial buffer
    g = transfer.Folder(a.shape, a.dtype, chunk_bytes=32 * 2 * 16)
    g.advance(host, 50)
    with pytest.raises(RuntimeError, match="not finished"):
        g.result()


def test_streamed_fq_cold_build_matches_plain_pack(tmp_path):
    """The cold-path pipeline (native range-pack thread || chunked
    upload) must produce EXACTLY the buffers of the one-shot native
    pack — same operator, same cache bytes."""
    from lam_tpu import _native_io
    from lam_tpu.solver import pack_cache as pc
    from lam_tpu.solver.operators import DenseOperator
    from lam_tpu import generate as gen

    if not (_native_io.available() and _native_io.has_range_pack("fq")):
        pytest.skip("native range pack unavailable")
    a = gen.random_spd_matrix(1600, seed=6)   # several tile-rows
    src = tmp_path / "m.npy"
    np.save(src, a)
    op = DenseOperator.from_file_fq(str(src), pack_cache=True)
    # reference buffers from the one-shot native pack
    from lam_tpu.solver.operators import (_open_matrix_memmap,
                                          padded_size)
    from lam_tpu.ops.gemv import SYMM_TB
    _, off = _open_matrix_memmap(str(src))
    n_p = padded_size(1600, SYMM_TB)
    ref = _native_io.pack_fq(str(src), off, 1600, n_p, SYMM_TB)
    for got, want in zip(op.operand, ref):
        np.testing.assert_array_equal(np.asarray(got), want)
    # and the published cache holds the same bytes
    cached = pc.load(str(src), "fq")
    assert cached is not None
    for got, want in zip(cached[3], ref):
        np.testing.assert_array_equal(got, want)
