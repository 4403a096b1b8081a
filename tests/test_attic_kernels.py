"""Windowed-ELL (general unstructured) SpMV: layout planner + reference
tier vs a scipy oracle, and the Pallas kernel in interpret mode vs the
reference tier (SURVEY §4 tier-3 pattern).

Covers the TPU answer to the reference's load-balanced CSR SpMV
(common/cuda_hip/matrix/csr_kernels.template.cpp:251-472): entries that
fit the windowed layout run on-chip; violators spill to a COO tail that
must exactly complete the product.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.ops.attic import spmv_windowed as W


def _random_local(n, lo_deg, hi_deg, bw, seed=0):
    """Banded-ish random matrix: varying degree, columns within +-bw."""
    rng = np.random.default_rng(seed)
    rows_l, cols_l = [], []
    for r in range(n):
        deg = rng.integers(lo_deg, hi_deg)
        c = np.clip(r + rng.integers(-bw, bw, deg), 0, n - 1)
        rows_l.append(np.full(deg, r))
        cols_l.append(c)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    key = np.unique(rows * n + cols)
    rows, cols = key // n, key % n
    vals = rng.standard_normal(rows.size)
    return rows.astype(np.int64), cols.astype(np.int64), vals


def _plan(n, rows, cols, vals):
    d = MatrixData((n, n), rows, cols, vals)
    return W.plan_windowed_layout(d, vals)


def _apply_both(layout, tail, n, b, *, interpret_pallas=True):
    args = [jnp.asarray(layout[k]) for k in ("vals", "c16", "q0",
                                             "xbase_row")]
    y_ref = np.asarray(W.well_spmv_reference(*args, layout["meta"], b))
    tr, tc, tv = tail
    y_tail = sp.csr_matrix((tv, (tr, tc)), shape=(n, n)) @ np.asarray(b)
    y = y_ref + y_tail
    if interpret_pallas:
        a32 = [jnp.asarray(layout["vals"], jnp.float32)] + args[1:]
        y_pl = W.well_spmv_pallas(*a32, layout["meta"],
                                  jnp.asarray(b, jnp.float32),
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(y_pl), y_ref,
                                   rtol=2e-4, atol=2e-4)
    return y


@pytest.mark.parametrize("n,lo,hi,bw,seed", [
    (3000, 5, 30, 400, 0),
    (2500, 1, 8, 50, 1),       # low degree, tight band
    (1500, 20, 64, 1400, 2),   # wide spread -> spills exercised
])
@pytest.mark.slow
def test_windowed_matches_scipy(n, lo, hi, bw, seed):
    rows, cols, vals = _random_local(n, lo, hi, bw, seed)
    layout, tail, stats = _plan(n, rows, cols, vals)
    b = np.random.default_rng(seed + 100).standard_normal((n, 2))
    y = _apply_both(layout, tail, n, jnp.asarray(b))
    oracle = sp.csr_matrix((vals, (rows, cols)), shape=(n, n)) @ b
    np.testing.assert_allclose(y, oracle, rtol=1e-9, atol=1e-9)
    assert stats["ell_nnz"] + stats["tail_nnz"] == vals.size


def test_windowed_empty_and_tiny():
    # empty matrix -> planner declines
    d = MatrixData((0, 0), np.zeros(0, np.int64), np.zeros(0, np.int64),
                   np.zeros(0))
    layout, tail, stats = W.plan_windowed_layout(d, np.zeros(0))
    assert layout is None
    # single entry
    rows = np.array([3], np.int64)
    cols = np.array([7], np.int64)
    vals = np.array([2.5])
    layout, tail, stats = _plan(10, rows, cols, vals)
    b = np.zeros((10, 1))
    b[7, 0] = 2.0
    y = _apply_both(layout, tail, 10, jnp.asarray(b))
    assert abs(y[3, 0] - 5.0) < 1e-12 and np.abs(y).sum() == 5.0


def test_windowed_tail_is_exact_complement():
    rows, cols, vals = _random_local(1200, 30, 64, 1100, 3)
    layout, tail, stats = _plan(1200, rows, cols, vals)
    tr, tc, tv = tail
    # every entry accounted for exactly once
    all_keys = set(zip(rows.tolist(), cols.tolist()))
    tail_keys = set(zip(tr.tolist(), tc.tolist()))
    assert tail_keys <= all_keys
    assert stats["ell_nnz"] == len(all_keys) - len(tail_keys)


def test_automatical_picks_packed_for_fem_like():
    """automatical: banded for stencils, packed for general matrices
    with locality, classical for scattered smalls (csr.hpp:522-650
    automatical analog, TPU edition)."""
    import ginkgo_tpu as gt
    rng = np.random.default_rng(5)
    n = 4096
    n_off = 30
    offs = rng.integers(-600, 600, (n // 128, n_off))
    pick = rng.random((n, n_off)) < 0.6
    r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
    c = np.clip(r + offs[np.arange(n) // 128], 0, n - 1)
    rows, cols = r[pick], c[pick]
    key = np.unique(rows * n + cols)
    rows, cols = key // n, key % n
    vals = rng.standard_normal(rows.size)
    from ginkgo_tpu.base.matrix_data import MatrixData
    A = gt.Csr.from_data(MatrixData((n, n), rows, cols, vals))
    assert A.strategy == "packed"
    b = rng.standard_normal((n, 1))
    y = np.asarray(A.apply(jnp.asarray(b)))
    oracle = sp.csr_matrix((vals, (rows, cols)), shape=(n, n)) @ b
    np.testing.assert_allclose(y, oracle, rtol=1e-10, atol=1e-10)
    # value-mutating ops keep the packed aux consistent
    y2 = np.asarray(A.scale(2.5).apply(jnp.asarray(b)))
    np.testing.assert_allclose(y2, 2.5 * oracle, rtol=1e-10, atol=1e-10)
    y3 = np.asarray(A.astype(np.float32).apply(
        jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(y3, oracle, rtol=1e-4, atol=1e-4)
