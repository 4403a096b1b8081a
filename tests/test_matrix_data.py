"""matrix_data / IO / generator tests (core/test/base analogs)."""

import io

import numpy as np
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.base.mtx_io import read_mtx, write_mtx
from ginkgo_tpu.utils.generators import (generate_random_matrix, make_spd,
                                         stencil_2d, stencil_3d)


def test_sum_duplicates_and_remove_zeros():
    d = MatrixData((2, 2), [0, 0, 1, 1], [0, 0, 1, 0], [1.0, 2.0, 5.0, 0.0])
    c = d.canonical()
    assert c.nnz == 2
    np.testing.assert_allclose(c.to_dense(), [[3.0, 0.0], [0.0, 5.0]])


def test_sort_row_major():
    d = MatrixData((2, 3), [1, 0, 0], [0, 2, 1], [1.0, 2.0, 3.0])
    s = d.sort_row_major()
    assert list(s.row_idx) == [0, 0, 1]
    assert list(s.col_idx) == [1, 2, 0]
    assert list(s.values) == [3.0, 2.0, 1.0]


def test_transpose():
    d = MatrixData.from_dense(np.array([[1.0, 2.0], [0.0, 3.0]]))
    np.testing.assert_allclose(d.transpose().to_dense(),
                               [[1.0, 0.0], [2.0, 3.0]])


def test_mtx_roundtrip():
    d = generate_random_matrix(13, 7, nonzeros_per_row=(1, 5), seed=3)
    buf = io.StringIO()
    write_mtx(buf, d)
    buf.seek(0)
    back = read_mtx(buf)
    np.testing.assert_allclose(back.to_dense(), d.to_dense(), rtol=1e-14)


def test_mtx_symmetric():
    text = """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
2 2 2.0
3 3 1.5
"""
    d = read_mtx(text)
    dense = d.to_dense()
    np.testing.assert_allclose(dense, dense.T)
    assert dense[0, 1] == -1.0


def test_stencil_shapes():
    d5 = stencil_2d(4, points=5)
    assert d5.shape == (16, 16)
    dense = d5.to_dense()
    np.testing.assert_allclose(dense, dense.T)  # symmetric
    assert np.all(np.diag(dense) == 4.0)

    d27 = stencil_3d(3, points=27)
    assert d27.shape == (27, 27)
    # center node has all 26 neighbors
    center = 13
    assert (d27.to_dense()[center] != 0).sum() == 27


def test_stencil_spd():
    d = stencil_3d(4, points=7)
    w = np.linalg.eigvalsh(d.to_dense())
    assert w.min() > 0


def test_random_matrix_diag():
    d = generate_random_matrix(20, 20, nonzeros_per_row=(2, 6), seed=0,
                               ensure_diag=True)
    dense = d.to_dense()
    assert np.all(np.abs(np.diag(dense)) > 0)


def test_make_spd():
    d = generate_random_matrix(15, 15, nonzeros_per_row=(1, 6), seed=1)
    spd = make_spd(d)
    dense = spd.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-14)
    assert np.linalg.eigvalsh(dense).min() > 0


def test_device_canonicalize_matches_host():
    """device_matrix_data kernels: on-device sort/dedup/remove-zeros vs the
    host MatrixData oracle."""
    import jax
    import jax.numpy as jnp
    from ginkgo_tpu.matrix.coo import Coo
    from ginkgo_tpu.ops.device_matrix_data import canonicalize_device

    rng = np.random.default_rng(0)
    n, cap = 10, 32
    rows = rng.integers(0, n, cap)
    cols = rng.integers(0, n, cap)
    vals = rng.standard_normal(cap)
    vals[::7] = 0.0                      # explicit zeros
    host = MatrixData((n, n), rows, cols, vals).canonical()

    coo = Coo(row_idx=jnp.asarray(rows, jnp.int32),
              col_idx=jnp.asarray(cols, jnp.int32),
              values=jnp.asarray(vals), shape=(n, n), nnz=cap)
    out = jax.jit(canonicalize_device)(coo)
    np.testing.assert_allclose(np.asarray(out.to_dense()), host.to_dense(),
                               rtol=1e-14)
    # canonical order: valid prefix sorted row-major, padding at tail
    r = np.asarray(out.row_idx)
    valid = r < n
    assert valid[:valid.sum()].all()     # contiguous prefix
    rr, cc = r[valid], np.asarray(out.col_idx)[valid]
    keys = rr.astype(np.int64) * n + cc
    assert (np.diff(keys) > 0).all()     # strictly increasing => deduped


def test_write_mtx_accepts_operators_and_arrays(tmp_path):
    from ginkgo_tpu import Csr, read_mtx, write_mtx
    dense = np.array([[1.0, 0], [2.0, 3.0]])
    p1 = str(tmp_path / "op.mtx")
    write_mtx(p1, Csr.from_dense(dense))
    np.testing.assert_allclose(read_mtx(p1).to_dense(), dense)
    p2 = str(tmp_path / "arr.mtx")
    write_mtx(p2, dense)
    np.testing.assert_allclose(read_mtx(p2).to_dense(), dense)


def test_ginkgo_binary_format_bytes(tmp_path):
    """write_binary emits the reference's exact byte layout
    (core/base/mtx_io.cpp:762-905): verify the magic against the
    independently-computed formula and the packed record layout."""
    import struct

    from ginkgo_tpu.base.mtx_io import write_binary
    d = MatrixData((3, 4), np.array([0, 1, 2]), np.array([1, 0, 3]),
                   np.array([1.5, -2.0, 0.25]))
    path = str(tmp_path / "m.bin")
    write_binary(path, d)
    with open(path, "rb") as f:
        raw = f.read()
    # magic: 'G' + 256*('I' + 256*('N' + 256*('K' + 256*('G' + 256*('O' +
    # 256*(index*256 + value)))))) with value 'D' (f64), index 'L' (i64)
    shift = 256
    type_bits = ord("L") * shift + ord("D")
    magic = ord("G") + shift * (ord("I") + shift * (ord("N") + shift * (
        ord("K") + shift * (ord("G") + shift * (ord("O") + shift
                                                * type_bits)))))
    assert raw[:8] == struct.pack("<Q", magic)
    assert struct.unpack("<QQQ", raw[8:32]) == (3, 4, 3)
    r0, c0, v0 = struct.unpack("<qqd", raw[32:56])
    assert (r0, c0, v0) == (0, 1, 1.5)


@pytest.mark.parametrize("vdtype,idx", [(np.float64, "int64"),
                                        (np.float32, "int32"),
                                        (np.complex128, "int64"),
                                        (np.complex64, "int32"),
                                        (np.float16, "int32")])
def test_binary_roundtrip_types(vdtype, idx, tmp_path):
    from ginkgo_tpu.base.mtx_io import read_binary, write_binary
    rng = np.random.default_rng(0)
    v = rng.standard_normal(5).astype(vdtype)
    if np.issubdtype(vdtype, np.complexfloating):
        v = v + 1j * rng.standard_normal(5).astype(v.real.dtype)
    d = MatrixData((5, 5), np.arange(5), np.arange(5)[::-1].copy(), v)
    p = str(tmp_path / "m.bin")
    write_binary(p, d, index_dtype=idx)
    back = read_binary(p)
    assert back.shape == (5, 5) and back.nnz == 5
    got = back.to_dense()
    np.testing.assert_allclose(got, d.to_dense(), rtol=1e-3
                               if vdtype == np.float16 else 1e-12)


def test_binary_bf16_and_legacy_npz(tmp_path):
    import ml_dtypes

    from ginkgo_tpu.base.mtx_io import read_binary, write_binary
    d = MatrixData((2, 2), np.array([0, 1]), np.array([0, 1]),
                   np.array([1.5, -0.5], ml_dtypes.bfloat16))
    p = str(tmp_path / "m16.bin")
    write_binary(p, d)
    back = read_binary(p)
    np.testing.assert_allclose(np.asarray(back.values, np.float32),
                               [1.5, -0.5])
    # legacy npz files written by older versions still read
    pz = str(tmp_path / "legacy.bin")
    with open(pz, "wb") as f:
        np.savez(f, shape=np.asarray([2, 2], np.int64),
                 row_idx=np.array([0, 1]), col_idx=np.array([1, 0]),
                 values=np.array([3.0, 4.0]))
    back = read_binary(pz)
    np.testing.assert_allclose(back.to_dense(), [[0, 3], [4, 0]])
