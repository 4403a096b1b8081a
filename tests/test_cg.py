"""CG end-to-end + criteria + Jacobi — the simple-solver parity slice
(reference/test/solver/cg_kernels.cpp, examples/simple-solver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr, Dense
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu.solver import cg
from ginkgo_tpu.stop.criterion import (Combined, ImplicitResidualNorm,
                                       Iteration, ResidualNorm)
from ginkgo_tpu.utils.generators import (generate_random_matrix, make_spd,
                                         stencil_2d, stencil_3d)


def _poisson(n=5):
    data = stencil_3d(n, points=27)
    return Csr.from_data(data), data


def test_cg_poisson_27pt():
    A, data = _poisson(5)
    n = A.shape[0]
    x_true = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    b = A.apply(x_true)
    res = cg.solve(A, b, criteria=Iteration(500) | ResidualNorm(1e-12))
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, x_true, rtol=1e-8, atol=1e-8)
    # true residual matches recurrent residual scale
    true_res = np.linalg.norm(np.asarray(b - A.apply(res.x)))
    assert true_res <= 1e-11 * np.linalg.norm(np.asarray(b))


def test_cg_3x3_poisson_exact_iterations():
    """3-point 1D Poisson: CG converges in <= n iterations
    (cg_kernels.cpp solves the same tiny SPD systems)."""
    A = Csr.from_dense(np.array([[2.0, -1, 0], [-1, 2, -1], [0, -1, 2]]))
    b = jnp.asarray([1.0, 2.0, 3.0])
    res = cg.solve(A, b, criteria=Iteration(10) | ResidualNorm(1e-14))
    np.testing.assert_allclose(res.x, np.linalg.solve(A.to_dense(), b),
                               rtol=1e-12)
    assert int(res.iterations[0]) <= 3


def test_cg_multi_rhs_percolumn_stopping():
    A, _ = _poisson(4)
    n = A.shape[0]
    rng = np.random.default_rng(1)
    # column 1 starts at the solution -> should take 0 iterations
    x_true = jnp.asarray(rng.standard_normal((n, 2)))
    b = A.apply(x_true)
    res = cg.solve(A, b, x0=jnp.stack([jnp.zeros(n), x_true[:, 1]], axis=1),
                   criteria=Iteration(500) | ResidualNorm(1e-12))
    assert bool(res.converged.all())
    assert int(res.iterations[1]) == 0
    assert int(res.iterations[0]) > 0
    np.testing.assert_allclose(res.x, x_true, rtol=1e-7, atol=1e-8)


def test_cg_iteration_limit():
    A, _ = _poisson(4)
    b = jnp.ones(A.shape[0])
    res = cg.solve(A, b, criteria=Iteration(3) | ResidualNorm(1e-14))
    assert int(res.iterations[0]) == 3
    assert not bool(res.converged.any())


def test_cg_implicit_residual_criterion():
    A, _ = _poisson(4)
    b = jnp.ones(A.shape[0])
    res = cg.solve(A, b,
                   criteria=Iteration(500) | ImplicitResidualNorm(1e-10))
    assert bool(res.converged.all())
    true_res = np.linalg.norm(np.asarray(b - A.apply(res.x)))
    assert true_res <= 1e-8 * np.linalg.norm(np.asarray(b))


def test_cg_jacobi_preconditioner_accelerates():
    data = make_spd(generate_random_matrix(
        120, 120, nonzeros_per_row=(2, 8), seed=3), shift=0.1)
    A = Csr.from_data(data)
    b = jnp.ones(120)
    crit = Iteration(2000) | ResidualNorm(1e-10)
    plain = cg.solve(A, b, criteria=crit)
    prec = cg.solve(A, b, criteria=crit, preconditioner=Jacobi())
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0])


def test_cg_block_jacobi():
    A, _ = _poisson(4)
    b = jnp.ones(A.shape[0])
    crit = Iteration(2000) | ResidualNorm(1e-10)
    scalar = cg.solve(A, b, criteria=crit, preconditioner=Jacobi())
    block = cg.solve(A, b, criteria=crit,
                     preconditioner=Jacobi(max_block_size=8))
    assert bool(block.converged.all())
    # both should converge quickly on this diagonally dominant problem
    assert int(block.iterations[0]) <= 2 * int(scalar.iterations[0]) + 5


def test_block_jacobi_apply_matches_dense_inverse():
    data = make_spd(generate_random_matrix(
        30, 30, nonzeros_per_row=(1, 6), seed=4), shift=0.5)
    A = Csr.from_data(data)
    M = Jacobi(max_block_size=4).generate(A)
    dense = np.asarray(A.to_dense())
    want = np.zeros_like(dense)
    for i in range(0, 30, 4):
        j = min(i + 4, 30)
        want[i:j, i:j] = np.linalg.inv(dense[i:j, i:j])
    b = jnp.asarray(np.random.default_rng(5).standard_normal((30, 2)))
    np.testing.assert_allclose(M.apply(b), want @ np.asarray(b), rtol=1e-10)


def test_adaptive_storage_block_jacobi():
    A, _ = _poisson(4)
    M = Jacobi(max_block_size=8, storage_dtype=jnp.float32).generate(A)
    assert M.inv_blocks.dtype == jnp.float32
    b = jnp.ones(A.shape[0])
    res = cg.solve(A, b, preconditioner=M,
                   criteria=Iteration(2000) | ResidualNorm(1e-10))
    assert bool(res.converged.all())


def test_cg_solve_is_jittable():
    A, _ = _poisson(3)
    b = jnp.ones(A.shape[0])
    crit = Iteration(200) | ResidualNorm(1e-10)
    jitted = jax.jit(lambda A, b: cg.solve(A, b, criteria=crit))
    res = jitted(A, b)
    assert bool(res.converged.all())


def test_cg_trace_history():
    A, _ = _poisson(3)
    b = jnp.ones(A.shape[0])
    res = cg.solve(A, b, criteria=Iteration(50) | ResidualNorm(1e-10),
                   trace=True)
    h = np.asarray(res.resnorm_history)[:, 0]
    assert h.shape[0] == 51
    assert h[0] > 0
    # monotone-ish decrease to convergence
    it = int(res.iterations[0])
    assert h[it] <= 1e-10 * np.linalg.norm(np.asarray(b)) * 10


def test_cg_as_linop_factory():
    from ginkgo_tpu.solver.cg import Cg
    A, _ = _poisson(3)
    solver = Cg.build(criteria=Iteration(300) | ResidualNorm(1e-12)).generate(A)
    b = jnp.ones(A.shape[0])
    x = solver.apply(b)
    np.testing.assert_allclose(A.apply(x), b, rtol=1e-8, atol=1e-9)


def test_cg_zero_rhs():
    A, _ = _poisson(3)
    res = cg.solve(A, jnp.zeros(A.shape[0]),
                   criteria=Iteration(100) | ResidualNorm(1e-12))
    assert int(res.iterations[0]) == 0
    np.testing.assert_allclose(res.x, 0.0)


def test_natural_block_jacobi():
    """find_blocks analog: natural blocks detected from sparsity."""
    from ginkgo_tpu.preconditioner.jacobi import find_natural_blocks
    rng = np.random.default_rng(7)
    n = 12
    dense = np.zeros((n, n))
    for s in range(0, n, 3):
        dense[s:s + 3, s:s + 3] = rng.standard_normal((3, 3)) + 4 * np.eye(3)
    dense[0, 7] = 0.1          # off-block entry must not merge blocks
    A = Csr.from_dense(dense)
    assert list(find_natural_blocks(A, 8)) == [0, 3, 6, 9, 12]
    M = Jacobi(max_block_size=8, natural_blocks=True).generate(A)
    b = rng.standard_normal((n, 2))
    want = np.zeros_like(b)
    for s in range(0, n, 3):
        want[s:s + 3] = np.linalg.solve(dense[s:s + 3, s:s + 3], b[s:s + 3])
    np.testing.assert_allclose(M.apply(jnp.asarray(b)), want, rtol=1e-10)


def test_variable_block_pointers_jacobi():
    rng = np.random.default_rng(8)
    dense = rng.standard_normal((10, 10)) + 10 * np.eye(10)
    A = Csr.from_dense(dense)
    M = Jacobi(block_pointers=[0, 2, 7, 10]).generate(A)
    b = rng.standard_normal(10)
    want = np.zeros(10)
    for s, e in [(0, 2), (2, 7), (7, 10)]:
        want[s:e] = np.linalg.solve(dense[s:e, s:e], b[s:e])
    np.testing.assert_allclose(M.apply(jnp.asarray(b)), want, rtol=1e-8)
    with pytest.raises(ValueError):
        Jacobi(block_pointers=[0, 5]).generate(A)   # doesn't cover [0, n)


def test_adaptive_perblock_precision_jacobi():
    """precision_reduction autodetect analog: well-conditioned blocks get
    reduced storage, ill-conditioned ones stay full."""
    rng = np.random.default_rng(9)
    n = 16
    dense = np.zeros((n, n))
    for s in range(0, 8, 4):            # well-conditioned blocks
        dense[s:s+4, s:s+4] = np.eye(4) * rng.uniform(1, 2)
    for s in range(8, 16, 4):           # ill-conditioned blocks
        B = np.eye(4)
        B[0, 0] = 1e9
        dense[s:s+4, s:s+4] = B
    A = Csr.from_dense(dense)
    M = Jacobi(max_block_size=4, storage_optimization="auto",
               storage_dtype=jnp.bfloat16, accuracy=1e-2).generate(A)
    frac = float(M.storage_fraction_reduced)
    assert 0.0 < frac < 1.0             # mixed storage really happened
    # apply still matches the blockwise inverse to arithmetic accuracy
    b = rng.standard_normal((n, 1))
    want = np.zeros_like(b)
    for s in range(0, n, 4):
        want[s:s+4] = np.linalg.solve(dense[s:s+4, s:s+4], b[s:s+4])
    got = np.asarray(M.apply(jnp.asarray(b)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-2
