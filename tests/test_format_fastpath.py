"""Format-zoo TPU fast path (VERDICT r2 task 3).

Ell/Sellp/Hybrid/Coo plan into the shared banded/packed layouts at build
time (matrix/fastpath.py) — the TPU answer to the reference's per-format
tuned kernels (common/cuda_hip/matrix/{coo,ell,sellp}_kernels.cpp,
hybrid split include/ginkgo/core/matrix/hybrid.hpp:42).  These tests pin
(a) plan acceptance on stencil (banded) and FEM-like (packed) patterns,
(b) exact agreement with each format's own gather path and the dense
oracle, and (c) opt-out + non-acceptance fallbacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.matrix.coo import Coo
from ginkgo_tpu.matrix.ell import Ell
from ginkgo_tpu.matrix.fbcsr import Fbcsr
from ginkgo_tpu.matrix.hybrid import Hybrid
from ginkgo_tpu.matrix.sellp import Sellp
from ginkgo_tpu.utils.generators import stencil_3d

FORMATS = [Coo, Ell, Sellp, Hybrid, Fbcsr]


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


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.__name__)
def test_stencil_takes_banded_plan(fmt):
    data = stencil_3d(8, points=27)
    A = fmt.from_data(data)
    assert A.fast_op is not None and A.fast_op.strategy == "banded"
    x = np.random.default_rng(0).standard_normal(512)
    y = np.asarray(A.apply(jnp.asarray(x)))
    slow = fmt.from_data(data, fast=False)
    assert slow.fast_op is None
    np.testing.assert_allclose(y, np.asarray(slow.apply(jnp.asarray(x))),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(y, data.to_dense() @ x,
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.__name__)
def test_fem_pattern_takes_packed_plan(fmt):
    data = _fem_like(1024)
    A = fmt.from_data(data)
    assert A.fast_op is not None and A.fast_op.strategy == "packed", (
        "FEM-like column locality must be accepted by the packed planner")
    x = np.random.default_rng(1).standard_normal((1024, 3))
    y = np.asarray(jax.jit(lambda op, v: op.apply(v))(A, jnp.asarray(x)))
    np.testing.assert_allclose(y, data.to_dense() @ x,
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.__name__)
def test_no_locality_falls_back(fmt):
    rng = np.random.default_rng(2)
    n = 512
    rows = np.repeat(np.arange(n), 4)
    cols = rng.integers(0, n, rows.size)
    data = MatrixData((n, n), rows, cols,
                      rng.standard_normal(rows.size)).canonical()
    A = fmt.from_data(data)
    # fully random columns: neither layout is economical
    assert A.fast_op is None
    x = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(A.apply(jnp.asarray(x))),
                               data.to_dense() @ x, rtol=1e-10, atol=1e-10)


def test_ell_truncation_plan_matches_storage():
    """The plan must represent the truncated entries, not the input."""
    data = _fem_like(512)
    w = 8
    A = Ell.from_data(data, width=w, allow_truncate=True)
    x = np.random.default_rng(3).standard_normal(512)
    slow = Ell.from_data(data, width=w, allow_truncate=True, fast=False)
    np.testing.assert_allclose(np.asarray(A.apply(jnp.asarray(x))),
                               np.asarray(slow.apply(jnp.asarray(x))),
                               rtol=1e-12, atol=1e-12)


def test_compute_absolute_keeps_plan_consistent():
    data = stencil_3d(6, points=27)
    x = np.random.default_rng(4).standard_normal(216)
    for fmt in FORMATS:
        A = fmt.from_data(data).compute_absolute()
        np.testing.assert_allclose(
            np.asarray(A.apply(jnp.asarray(x))),
            np.abs(data.to_dense()) @ x, rtol=1e-10, atol=1e-10,
            err_msg=fmt.__name__)
