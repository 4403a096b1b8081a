"""Matrix format tests — reference/test/matrix analogs.

Each format: SpMV vs dense oracle, advanced apply, conversions, transpose,
over multiple value types (Ginkgo's typed-test discipline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Coo, Csr, Dense, Diagonal, Ell, Identity
from ginkgo_tpu.base.dtypes import reduction_factor
from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.utils.generators import generate_random_matrix, stencil_2d, stencil_3d

VALUE_TYPES = [np.float32, np.float64, np.complex128]
FORMATS = [Csr, Coo, Ell, Dense]


def _rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        x = x + 1j * rng.standard_normal(shape)
    return jnp.asarray(x.astype(dtype))


@pytest.mark.parametrize("dtype", VALUE_TYPES)
@pytest.mark.parametrize("fmt", FORMATS)
def test_spmv_vs_dense(fmt, dtype):
    data = generate_random_matrix(37, 29, nonzeros_per_row=(0, 9), seed=5,
                                  dtype=dtype)
    A = fmt.from_data(data)
    b = _rand((29, 3), dtype)
    got = A.apply(b)
    want = jnp.asarray(data.to_dense()) @ b
    tol = reduction_factor(dtype)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.parametrize("fmt", FORMATS)
def test_advanced_apply(fmt):
    data = generate_random_matrix(20, 20, nonzeros_per_row=(1, 7), seed=6)
    A = fmt.from_data(data)
    b = _rand((20, 2), np.float64, 1)
    x = _rand((20, 2), np.float64, 2)
    got = A.apply_advanced(2.5, b, -0.5, x)
    want = 2.5 * jnp.asarray(data.to_dense()) @ b - 0.5 * x
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_rank1_vector_roundtrip():
    data = generate_random_matrix(11, 11, nonzeros_per_row=(1, 4), seed=7)
    A = Csr.from_data(data)
    b = _rand((11,), np.float64)
    assert A.apply(b).shape == (11,)


def test_csr_banded_strategy_on_stencil():
    data = stencil_3d(5, points=27)
    A = Csr.from_data(data, strategy="automatical")
    assert A.strategy == "banded"
    b = _rand((125, 2), np.float64)
    want = jnp.asarray(data.to_dense()) @ b
    np.testing.assert_allclose(A.apply(b), want, rtol=1e-12)
    # classical strategy agrees
    A2 = Csr.from_data(data, strategy="classical")
    np.testing.assert_allclose(A2.apply(b), want, rtol=1e-12)


def test_csr_random_is_classical():
    data = generate_random_matrix(64, 64, nonzeros_per_row=(1, 30), seed=8)
    A = Csr.from_data(data, strategy="automatical")
    assert A.strategy == "classical"


def test_transpose_roundtrip():
    data = generate_random_matrix(14, 9, nonzeros_per_row=(0, 5), seed=9)
    A = Csr.from_data(data)
    At = A.transpose()
    assert At.shape == (9, 14)
    np.testing.assert_allclose(At.to_dense(), A.to_dense().T)
    np.testing.assert_allclose(A.conj_transpose().to_dense(),
                               A.to_dense().conj().T)


def test_conversions():
    data = generate_random_matrix(12, 12, nonzeros_per_row=(0, 6), seed=10)
    A = Csr.from_data(data)
    dense = A.to_dense()
    np.testing.assert_allclose(A.to_coo().to_dense(), dense)
    np.testing.assert_allclose(A.to_coo().to_csr().to_dense(), dense)
    np.testing.assert_allclose(Ell.from_data(data).to_dense(), dense)
    np.testing.assert_allclose(Ell.from_data(data).to_csr().to_dense(), dense)


def test_extract_diagonal():
    data = generate_random_matrix(10, 10, nonzeros_per_row=(1, 4), seed=11,
                                  ensure_diag=True)
    A = Csr.from_data(data)
    np.testing.assert_allclose(A.extract_diagonal().values,
                               jnp.diagonal(A.to_dense()))


def test_identity_and_diagonal():
    ident = Identity(size=5)
    b = _rand((5, 2), np.float64)
    np.testing.assert_allclose(ident.apply(b), b)
    np.testing.assert_allclose(ident.apply_advanced(2.0, b, 3.0, b), 5.0 * b)

    dvals = jnp.asarray([1.0, 2.0, 4.0, 8.0, 16.0])
    D = Diagonal(values=dvals)
    np.testing.assert_allclose(D.apply(b), dvals[:, None] * b)
    np.testing.assert_allclose(D.inverse_apply(D.apply(b)), b, rtol=1e-14)


def test_operators_are_pytrees_and_jittable():
    data = stencil_2d(6, points=5)
    A = Csr.from_data(data)

    @jax.jit
    def f(op, b):
        return op.apply(b)

    b = _rand((36, 1), np.float64)
    np.testing.assert_allclose(f(A, b), A.apply(b))
    leaves = jax.tree_util.tree_leaves(A)
    assert all(hasattr(l, "dtype") for l in leaves)


def test_composition_combination():
    from ginkgo_tpu import Combination, Composition
    d1 = generate_random_matrix(8, 8, nonzeros_per_row=(1, 4), seed=12)
    d2 = generate_random_matrix(8, 8, nonzeros_per_row=(1, 4), seed=13)
    A, B = Csr.from_data(d1), Csr.from_data(d2)
    b = _rand((8, 2), np.float64)
    comp = Composition(ops=(A, B))
    np.testing.assert_allclose(comp.apply(b), A.apply(B.apply(b)), rtol=1e-13)
    comb = Combination(coefficients=(2.0, -1.0), operators=(A, B))
    np.testing.assert_allclose(comb.apply(b),
                               2 * A.apply(b) - B.apply(b), rtol=1e-13)


def test_banded_with_tail_strategy():
    """Almost-banded matrices keep the banded fast path: off-band outliers
    go to a small COO tail correction."""
    from ginkgo_tpu.utils.generators import stencil_2d
    data = stencil_2d(32, points=5)      # 1024 rows, 5 dense diagonals
    n = data.shape[0]
    # add a handful of off-band outliers (boundary-condition-like)
    extra_r = np.array([0, 1, 5, n - 1])
    extra_c = np.array([n - 1, n - 3, n - 10, 0])
    extra_v = np.array([0.5, -0.25, 0.125, 0.75])
    noisy = MatrixData((n, n),
                       np.concatenate([data.row_idx, extra_r]),
                       np.concatenate([data.col_idx, extra_c]),
                       np.concatenate([data.values, extra_v]))
    A = Csr.from_data(noisy)
    assert A.strategy == "banded"
    assert A.tail_rows is not None
    assert len(A.diag_offsets) == 5      # outlier diagonals NOT in the band
    b = np.random.default_rng(0).standard_normal((n, 2))
    np.testing.assert_allclose(np.asarray(A.apply(jnp.asarray(b))),
                               noisy.to_dense() @ b, rtol=1e-12, atol=1e-12)
    # scale/astype propagate to the tail
    np.testing.assert_allclose(np.asarray(A.scale(2.0).apply(
        jnp.asarray(b))), 2 * (noisy.to_dense() @ b), rtol=1e-12)


def test_big_tail_falls_back_to_classical():
    rng = np.random.default_rng(1)
    n = 256
    # diagonal plus lots of random off-band entries
    r = np.concatenate([np.arange(n), rng.integers(0, n, 400)])
    c = np.concatenate([np.arange(n), rng.integers(0, n, 400)])
    v = rng.standard_normal(r.shape[0])
    data = MatrixData((n, n), r, c, v)
    A = Csr.from_data(data)
    assert A.strategy == "classical"
