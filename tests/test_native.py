"""Native C++ IO/generator library vs the numpy reference paths."""

import numpy as np
import pytest

from lam_tpu import _native_io
from lam_tpu import generate as gen
from lam_tpu import io as lio

pytestmark = pytest.mark.skipif(not _native_io.available(),
                                reason="native library not built")


def test_native_read_rows_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((33, 17))
    path = tmp_path / "m.bin"
    lio.write_matrix(path, a)
    np.testing.assert_array_equal(_native_io.read_rows(path, 0, 33, 17), a)
    np.testing.assert_array_equal(_native_io.read_rows(path, 5, 9, 17),
                                  a[5:14])


def test_native_split_read(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.uniform(-1e3, 1e3, (20, 40))
    path = tmp_path / "m.bin"
    lio.write_matrix(path, a)
    hi, lo = _native_io.read_rows_split(path, 2, 10, 40)
    expect_hi = a[2:12].astype(np.float32)
    expect_lo = (a[2:12] - expect_hi.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(hi, expect_hi)
    np.testing.assert_array_equal(lo, expect_lo)
    # round trip carries ~2^-48 relative error (lo is itself f32-rounded)
    np.testing.assert_allclose(
        hi.astype(np.float64) + lo.astype(np.float64), a[2:12],
        rtol=2 ** -47)


def test_native_split_f64():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1e6, 1e6, (100, 100))
    hi, lo = _native_io.split_f64(a)
    np.testing.assert_allclose(
        hi.astype(np.float64) + lo.astype(np.float64), a, rtol=2 ** -47)
    # and matches the Python split bit-for-bit
    from lam_tpu.precision import split_f64 as jsplit
    import jax.numpy as jnp
    jhi, jlo = jsplit(jnp.asarray(a))
    np.testing.assert_array_equal(hi, np.asarray(jhi))
    np.testing.assert_array_equal(lo, np.asarray(jlo))


def test_native_write_matches_python_writer(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((7, 5))
    p1 = tmp_path / "py.bin"
    p2 = tmp_path / "native.bin"
    lio.write_matrix(p1, a)
    _native_io.write_matrix(p2, a)
    assert p1.read_bytes() == p2.read_bytes()


def test_native_tridiagonal_matches_python():
    np.testing.assert_array_equal(
        _native_io.tridiagonal_rows(3, 4, 10),
        gen.tridiagonal_rows(3, 4, 10))
    # padded rows beyond n stay zero
    blk = _native_io.tridiagonal_rows(8, 4, 10)
    assert np.all(blk[2:] == 0)
    hi, lo = _native_io.tridiagonal_rows_split(3, 4, 10)
    np.testing.assert_array_equal(hi.astype(np.float64),
                                  gen.tridiagonal_rows(3, 4, 10))
    assert np.all(lo == 0)


def test_native_dfq_pack_bitwise_matches_python(tmp_path, monkeypatch):
    """ln_pack_dfq (fused read+split+quantize over the lower triangle)
    must reproduce the Python pack's buffers BIT FOR BIT — same split,
    same frexp-exact power-of-two scales, same rint/clip — on both the
    reference .bin format and .npy sources."""
    from lam_tpu.solver.operators import DenseOperator
    monkeypatch.setattr("lam_tpu.ops.gemv.SYMM_TB", 256)
    n = 700   # padding exercised: 700 -> 768
    a = gen.random_spd_matrix_fast(n, seed=17)
    bin_path = tmp_path / "m.bin"
    npy_path = tmp_path / "m.npy"
    lio.write_matrix(str(bin_path), a)
    np.save(npy_path, a)
    ref = DenseOperator.from_dense_dfq(a, check_symmetric=False)
    for path in (bin_path, npy_path):
        op = DenseOperator.from_file_dfq(str(path))
        assert op.n_padded == ref.n_padded and op.precision == "dfq"
        for name, x, y in zip(("hi", "loq", "sc", "dh", "dl"),
                              op.operand, ref.operand):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{path}:{name}")


def test_from_file_quantized_rejects_nonsquare_npy(tmp_path):
    """A non-square .npy must be refused by BOTH native-pack file
    constructors — fed to the native pack it would be read with the
    wrong row stride and yield a silently wrong operator (round-3
    review finding: from_file_fq lacked the check from_file_dfq had;
    both now share _open_matrix_memmap)."""
    import pytest

    from lam_tpu.solver.operators import DenseOperator
    path = tmp_path / "rect.npy"
    np.save(path, np.zeros((64, 128), np.float64))
    for ctor in (DenseOperator.from_file_dfq, DenseOperator.from_file_fq):
        with pytest.raises(ValueError, match="square"):
            ctor(str(path))


def test_from_file_quantized_corrupt_header_clean_error(tmp_path):
    """A corrupt reference-format header (rows != cols, product far
    beyond the file size) must fail with the actionable 'must be
    square' ValueError, not a raw mmap OSError — the header check runs
    BEFORE np.memmap (second-review fix)."""
    import pytest
    import struct

    from lam_tpu.solver.operators import DenseOperator
    path = tmp_path / "corrupt.bin"
    # header claims 100000 x 64 but the file holds 8 payload bytes
    path.write_bytes(struct.pack("<qq", 100000, 64) + b"\0" * 8)
    for ctor in (DenseOperator.from_file_dfq, DenseOperator.from_file_fq):
        with pytest.raises(ValueError, match="square"):
            ctor(str(path))


def test_native_fq_pack_bitwise_matches_python(tmp_path, monkeypatch):
    """ln_pack_fq (fused read + triple int16 quantize over the lower
    triangle) must reproduce the Python cascade BIT FOR BIT — same f64
    abs-max, same frexp-exact power-of-two scales, same rint/clip and
    exact residual updates — on both source formats."""
    from lam_tpu.solver.operators import DenseOperator
    monkeypatch.setattr("lam_tpu.ops.gemv.SYMM_TB", 256)
    n = 700   # padding exercised: 700 -> 768
    a = gen.random_spd_matrix_fast(n, seed=19)
    bin_path = tmp_path / "m.bin"
    npy_path = tmp_path / "m.npy"
    lio.write_matrix(str(bin_path), a)
    np.save(npy_path, a)
    ref = DenseOperator.from_dense_fq(a, check_symmetric=False)
    for path in (bin_path, npy_path):
        op = DenseOperator.from_file_fq(str(path))
        assert op.n_padded == ref.n_padded and op.precision == "fq"
        for name, x, y in zip(
                ("q1", "q2", "q3", "s1", "s2", "s3", "dh", "dl"),
                op.operand, ref.operand):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{path}:{name}")


def _gold_planes(a, tb, want_lo):
    """The from_dense packed-plane layout, computed the slow obvious
    way: pad, convert, pack_tri_host — the contract ln_pack_planes and
    _host_pack_planes both promise to match bit for bit."""
    from lam_tpu.ops.gemv import pack_tri_host
    from lam_tpu.solver.operators import padded_size
    n = a.shape[0]
    n_p = padded_size(n, tb)
    ap = np.zeros((n_p, n_p), np.float64)
    ap[:n, :n] = a
    hi = ap.astype(np.float32)
    if not want_lo:
        return (pack_tri_host(hi, tb),)
    lo = (ap - hi.astype(np.float64)).astype(np.float32)
    return (pack_tri_host(hi, tb), pack_tri_host(lo, tb))


@pytest.mark.parametrize("precision", ["f32", "df64"])
def test_native_plane_pack_bitwise_matches_python(tmp_path, monkeypatch,
                                                  precision):
    """ln_pack_planes (fused lower-triangle read + f32/(hi,lo) convert)
    and the numpy fallback _host_pack_planes must BOTH reproduce
    from_dense's astype/split + pack_tri_host bit for bit, on both
    source formats — the unquantized siblings of the dfq/fq packs
    (VERDICT r3 item 3: the 719 s N=50000 f32 load these paths kill)."""
    from lam_tpu.solver.operators import DenseOperator
    monkeypatch.setattr("lam_tpu.ops.gemv.SYMM_TB", 256)
    n = 700   # padding exercised: 700 -> 768
    a = gen.random_spd_matrix_fast(n, seed=23)
    bin_path = tmp_path / "m.bin"
    npy_path = tmp_path / "m.npy"
    lio.write_matrix(str(bin_path), a)
    np.save(npy_path, a)
    gold = _gold_planes(a, 256, want_lo=(precision == "df64"))
    ctor = (DenseOperator.from_file_f32 if precision == "f32"
            else DenseOperator.from_file_df64)
    names = ("hi",) if precision == "f32" else ("hi", "lo")

    for native in (True, False):
        if not native:
            monkeypatch.setattr("lam_tpu._native_io.available",
                                lambda: False)
        for path in (bin_path, npy_path):
            op = ctor(str(path))
            assert op.precision == precision
            assert op.engine == "pallas_symm_packed"
            got = op.operand if isinstance(op.operand, tuple) \
                else (op.operand,)
            for name, x, y in zip(names, got, gold):
                np.testing.assert_array_equal(
                    np.asarray(x), y,
                    err_msg=f"native={native} {path}:{name}")
