"""Packed-slot windowed-ELL kernel (ops/spmv_packed.py): layout + reference
tier vs scipy, and the Pallas kernel in interpret mode vs the reference
tier — including the multi-RHS path that streams the matrix tiles once
per <=8-column chunk (tests/test_pallas_kernels.py pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.ops import spmv_packed as P


def _fem_like(n, n_off=24, spread=500, seed=0):
    rng = np.random.default_rng(seed)
    offs = rng.integers(-spread, spread, (-(-n // 128), n_off))
    pick = rng.random((n, n_off)) < 0.6
    r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
    c = np.clip(r + offs[np.arange(n) // 128], 0, n - 1)
    rows, cols = r[pick], c[pick]
    key = np.unique(rows * n + cols)
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    vals = rng.standard_normal(rows.size)
    return MatrixData((n, n), rows, cols, vals)


def _apply_packed(data, b, *, interpret_pallas=True):
    d = data.canonical()
    n = d.shape[0]
    layout, tail, stats = P.plan_packed_layout(d, d.values)
    assert layout is not None
    args = [jnp.asarray(layout[k]) for k in ("vals", "idx", "qw",
                                             "xbase_row")]
    y_ref = np.asarray(P.pell_spmv_reference(*args, layout["meta"], b))
    tr, tc, tv = tail
    y_tail = sp.csr_matrix((tv, (tr, tc)), shape=d.shape) @ np.asarray(b)
    if interpret_pallas:
        a32 = [jnp.asarray(layout["vals"], jnp.float32)] + args[1:]
        y_pl = P.pell_spmv_pallas(*a32, layout["meta"],
                                  jnp.asarray(b, jnp.float32),
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(y_pl), y_ref,
                                   rtol=2e-4, atol=2e-4)
    return y_ref + y_tail


@pytest.mark.slow
@pytest.mark.parametrize("n,seed", [(1500, 0), (4096, 3)])
def test_packed_matches_scipy_k1(n, seed):
    data = _fem_like(n, seed=seed)
    d = data.canonical()
    b = np.random.default_rng(1).standard_normal((n, 1))
    y = _apply_packed(data, jnp.asarray(b))
    oracle = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)),
                           shape=d.shape) @ b
    np.testing.assert_allclose(y, oracle, rtol=1e-10, atol=1e-10)


@pytest.mark.slow
@pytest.mark.parametrize("k", [2, 3, 8, 11])
def test_packed_multi_rhs_streams_matrix_once(k):
    """k <= 8 runs as ONE kernel call with per-column x windows; k = 11
    exercises the 8+3 chunking."""
    n = 2048
    data = _fem_like(n, seed=5)
    d = data.canonical()
    b = np.random.default_rng(2).standard_normal((n, k))
    y = _apply_packed(data, jnp.asarray(b))
    oracle = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)),
                           shape=d.shape) @ b
    np.testing.assert_allclose(y, oracle, rtol=1e-10, atol=1e-10)


def test_packed_tail_is_exact_complement():
    n = 1200
    data = _fem_like(n, spread=900, seed=7)
    d = data.canonical()
    layout, tail, stats = P.plan_packed_layout(d, d.values, wv_cap=12)
    tr, tc, tv = tail
    assert stats["ell_nnz"] + tr.size == d.nnz
    # every entry lands exactly once: reference + tail == full matrix
    b = np.random.default_rng(0).standard_normal((n, 1))
    y = _apply_packed(data, jnp.asarray(b), interpret_pallas=False)
    oracle = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)),
                           shape=d.shape) @ b
    np.testing.assert_allclose(y, oracle, rtol=1e-10, atol=1e-10)


def test_packed_empty_and_identity():
    n = 300
    empty = MatrixData((n, n), np.zeros(0, np.int64),
                       np.zeros(0, np.int64), np.zeros(0))
    layout, tail, stats = P.plan_packed_layout(empty.canonical(),
                                               empty.values)
    assert layout is None
    eye = MatrixData((n, n), np.arange(n), np.arange(n), np.ones(n))
    b = np.random.default_rng(3).standard_normal((n, 2))
    y = _apply_packed(eye, jnp.asarray(b))
    np.testing.assert_allclose(y, b, rtol=1e-12)


@pytest.mark.slow
def test_packed_bf16_storage_f32_math():
    """bf16 value storage with f32 vectors/accumulation (the banded
    kernel's mixed-storage mode, applied to the packed layout — halves
    the dominant vals stream on chip)."""
    n = 2048
    data = _fem_like(n, seed=9)
    d = data.canonical()
    layout, tail, stats = P.plan_packed_layout(d, d.values)
    args = [jnp.asarray(layout["vals"], jnp.bfloat16),
            jnp.asarray(layout["idx"]), jnp.asarray(layout["qw"]),
            jnp.asarray(layout["xbase_row"])]
    b = np.random.default_rng(4).standard_normal((n, 2))
    y_ref = np.asarray(P.pell_spmv_reference(
        *args, layout["meta"], jnp.asarray(b, jnp.float32)))
    y_pl = np.asarray(P.pell_spmv_pallas(
        *args, layout["meta"], jnp.asarray(b, jnp.float32),
        interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=2e-2, atol=2e-2)
    # and against the exact oracle within bf16 tolerance
    tr, tc, tv = tail
    import scipy.sparse as _sp
    oracle = (_sp.csr_matrix((d.values, (d.row_idx, d.col_idx)),
                             shape=d.shape) @ b
              - _sp.csr_matrix((tv, (tr, tc)), shape=d.shape) @ b)
    np.testing.assert_allclose(y_pl, oracle, rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_packed_complex_planes_match_reference():
    """c64 packed SpMV = two real value-plane passes sharing the idx/qw
    streams (VERDICT r3 missing #2)."""
    rng = np.random.default_rng(31)
    d = _fem_like(1500, seed=31).canonical()
    vals_c = (d.values + 1j * rng.standard_normal(d.values.size)
              ).astype(np.complex64)
    layout, tail, stats = P.plan_packed_layout(d, vals_c)
    assert layout is not None
    args = [jnp.asarray(layout[k]) for k in ("vals", "idx", "qw",
                                             "xbase_row")]
    x = jnp.asarray((rng.standard_normal((1500, 2))
                     + 1j * rng.standard_normal((1500, 2))
                     ).astype(np.complex64))
    ref = P.pell_spmv_reference(*args, layout["meta"], x)
    got = P.pell_spmv_complex(*args, layout["meta"], x, interpret=True)
    assert got.dtype == jnp.complex64
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pell_c64_planes_public_api():
    """pell_spmv_c64_planes: planes in/out with no complex dtype in the
    compiled graph (the chip path on runtimes that cannot compile complex
    executables); agrees with the complex wrapper."""
    rng = np.random.default_rng(33)
    d = _fem_like(1500, seed=33).canonical()
    vals_c = (d.values + 1j * rng.standard_normal(d.values.size)
              ).astype(np.complex64)
    layout, tail, stats = P.plan_packed_layout(d, vals_c)
    assert layout is not None
    idx, qw, xb = (jnp.asarray(layout[k]) for k in ("idx", "qw",
                                                    "xbase_row"))
    x = (rng.standard_normal((1500, 2))
         + 1j * rng.standard_normal((1500, 2))).astype(np.complex64)
    ref = P.pell_spmv_complex(jnp.asarray(layout["vals"]), idx, qw, xb,
                              layout["meta"], jnp.asarray(x),
                              interpret=True)
    yr, yi = P.pell_spmv_c64_planes(
        jnp.asarray(layout["vals"].real), jnp.asarray(layout["vals"].imag),
        idx, qw, xb, layout["meta"],
        jnp.asarray(x.real), jnp.asarray(x.imag), interpret=True)
    assert yr.dtype == jnp.float32 and yi.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)
