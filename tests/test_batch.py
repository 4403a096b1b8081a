"""Batch module tests (batched-solver example / reference batch kernels
analogs): shared-pattern formats, vmapped whole-solve, per-system stop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.batch import (BatchBicgstab, BatchCg, BatchCsr, BatchDense,
                              BatchEll, BatchJacobi)
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd


def _batch_spd(nb=5, n=24, seed=0):
    pattern = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 5), seed=seed), shift=1.5)
    rng = np.random.default_rng(seed + 1)
    values = np.stack([pattern.values * rng.uniform(0.5, 2.0)
                       + 0.0 for _ in range(nb)])
    return BatchCsr.from_data((pattern, values)), pattern, values


def test_batch_csr_apply():
    A, pattern, values = _batch_spd()
    nb, n = values.shape[0], pattern.shape[0]
    b = np.random.default_rng(2).standard_normal((nb, n, 2))
    out = A.apply(jnp.asarray(b))
    for i in range(nb):
        dense = MatrixData(pattern.shape, pattern.row_idx, pattern.col_idx,
                           values[i]).to_dense()
        np.testing.assert_allclose(out[i], dense @ b[i], rtol=1e-12)


def test_batch_csr_pattern_mismatch_raises():
    a = generate_random_matrix(8, 8, nonzeros_per_row=(1, 3), seed=3)
    b = generate_random_matrix(8, 8, nonzeros_per_row=(1, 4), seed=4)
    if a.canonical().nnz == b.canonical().nnz:
        pytest.skip("patterns happen to match sizes")
    with pytest.raises(ValueError):
        BatchCsr.from_data([a, b])


def test_batch_dense_apply():
    rng = np.random.default_rng(5)
    data = rng.standard_normal((4, 6, 6))
    A = BatchDense(data=jnp.asarray(data))
    b = rng.standard_normal((4, 6, 1))
    out = A.apply(jnp.asarray(b))
    np.testing.assert_allclose(out, data @ b, rtol=1e-12)
    np.testing.assert_allclose(A.extract_diagonals(),
                               np.diagonal(data, axis1=1, axis2=2))


def test_batch_ell_apply():
    items = [generate_random_matrix(10, 10, nonzeros_per_row=(2, 4), seed=6)]
    # same pattern, scaled values
    items.append(MatrixData(items[0].shape, items[0].row_idx,
                            items[0].col_idx, items[0].values * 2))
    A = BatchEll.from_data([it.canonical() for it in items])
    b = np.random.default_rng(7).standard_normal((2, 10, 1))
    out = A.apply(jnp.asarray(b))
    for i, it in enumerate(items):
        np.testing.assert_allclose(out[i], it.to_dense() @ b[i], rtol=1e-12)


@pytest.mark.parametrize("make", [BatchCg, BatchBicgstab],
                         ids=["cg", "bicgstab"])
def test_batch_solver(make):
    A, pattern, values = _batch_spd(nb=6, n=20, seed=8)
    rng = np.random.default_rng(9)
    x_true = rng.standard_normal((6, 20))
    b = np.einsum("bnm,bm->bn", np.asarray(A.to_dense_batch()), x_true)
    solver = make(max_iterations=200, tolerance=1e-10)
    res = solver.solve(A, jnp.asarray(b))
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6, atol=1e-7)
    assert res.x.shape == (6, 20)
    assert res.iterations.shape == (6,)


def test_batch_solver_jacobi_preconditioned():
    A, pattern, values = _batch_spd(nb=4, n=30, seed=10)
    rng = np.random.default_rng(11)
    x_true = rng.standard_normal((4, 30))
    b = np.einsum("bnm,bm->bn", np.asarray(A.to_dense_batch()), x_true)
    solver = BatchCg(max_iterations=300, tolerance=1e-10,
                     preconditioner=BatchJacobi())
    res = solver.solve(A, jnp.asarray(b))
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6, atol=1e-7)


def test_batch_solver_absolute_tolerance():
    A, _, _ = _batch_spd(nb=3, n=16, seed=12)
    b = np.random.default_rng(13).standard_normal((3, 16))
    res = BatchCg(max_iterations=300, tolerance=1e-8,
                  tolerance_type="absolute").solve(A, jnp.asarray(b))
    assert bool(res.converged.all())
    assert float(res.resnorm.max()) <= 1e-7


def test_batch_solver_generate_api():
    A, _, _ = _batch_spd(nb=3, n=16, seed=14)
    gen = BatchCg(max_iterations=200, tolerance=1e-9).generate(A)
    b = np.random.default_rng(15).standard_normal((3, 16))
    x = gen.apply(jnp.asarray(b))
    Ad = np.asarray(A.to_dense_batch())
    for i in range(3):
        np.testing.assert_allclose(Ad[i] @ np.asarray(x[i]), b[i],
                                   rtol=1e-6, atol=1e-7)


def test_batch_solve_jittable():
    A, _, _ = _batch_spd(nb=3, n=12, seed=16)
    b = jnp.asarray(np.random.default_rng(17).standard_normal((3, 12)))
    solver = BatchCg(max_iterations=100, tolerance=1e-9)
    x = jax.jit(lambda A, b: solver.solve(A, b).x)(A, b)
    Ad = np.asarray(A.to_dense_batch())
    for i in range(3):
        np.testing.assert_allclose(Ad[i] @ np.asarray(x[i]), np.asarray(b)[i],
                                   rtol=1e-6, atol=1e-7)


def test_batch_solver_with_ell_format():
    """Batch solvers accept any batch format exposing values/item."""
    from ginkgo_tpu.batch import BatchCg, BatchEll
    pattern = make_spd(generate_random_matrix(
        16, 16, nonzeros_per_row=(2, 4), seed=20), shift=1.5)
    rng = np.random.default_rng(21)
    items = [MatrixData(pattern.shape, pattern.row_idx, pattern.col_idx,
                        pattern.values * s) for s in (1.0, 1.7)]
    A = BatchEll.from_data(items)
    x_true = rng.standard_normal((2, 16))
    dense = [it.to_dense() for it in items]
    b = np.stack([dense[i] @ x_true[i] for i in range(2)])
    res = BatchCg(max_iterations=200, tolerance=1e-10).solve(
        A, jnp.asarray(b))
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6, atol=1e-7)
