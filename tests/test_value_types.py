"""Value-type instantiation coverage (GKO_INSTANTIATE_FOR_EACH_VALUE_TYPE
analog): formats + CG across f32/f64/c64/c128 (+bf16 storage), index i32/i64,
initial-guess modes, umbrella namespace."""

import jax.numpy as jnp
import numpy as np
import pytest

import ginkgo_tpu as gt
from ginkgo_tpu.solver import Cg, Gmres
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd

REAL = [jnp.float32, jnp.float64]
CPLX = [jnp.complex64, jnp.complex128]


def _sys(dtype, n=24, seed=0):
    data = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 5), seed=seed), shift=1.0)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        rng = np.random.default_rng(seed + 1)
        # HPD: A + i*S with S skew-symmetric keeps hermitian positive definite
        skew = generate_random_matrix(n, n, nonzeros_per_row=(1, 3),
                                      seed=seed + 2).to_dense() * 0.1
        dense = data.to_dense().astype(complex) + 1j * (skew - skew.T)
        A = gt.Csr.from_dense(dense.astype(dtype))
    else:
        A = gt.Csr.from_data(data, dtype=dtype)
    rng = np.random.default_rng(seed + 3)
    x = rng.standard_normal(n)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        x = x + 1j * rng.standard_normal(n)
    x_true = jnp.asarray(x, dtype)
    return A, x_true, A.apply(x_true)


@pytest.mark.parametrize("dtype", REAL + CPLX, ids=str)
def test_cg_value_types(dtype):
    from ginkgo_tpu.base.dtypes import reduction_factor
    A, x_true, b = _sys(dtype)
    tol = reduction_factor(dtype)
    res = Cg.solve(A, b, criteria=Iteration(500) | ResidualNorm(tol))
    assert bool(res.converged.all()), dtype
    assert res.x.dtype == jnp.dtype(dtype)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true),
                               rtol=tol * 100, atol=tol * 10)


@pytest.mark.parametrize("dtype", CPLX, ids=str)
def test_gmres_complex(dtype):
    from ginkgo_tpu.base.dtypes import reduction_factor
    A, x_true, b = _sys(dtype, seed=5)
    tol = reduction_factor(dtype)
    res = Gmres.solve(A, b, criteria=Iteration(300) | ResidualNorm(tol))
    assert bool(res.converged.all()), dtype
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true),
                               rtol=tol * 100, atol=tol * 10)


@pytest.mark.parametrize("idx_dtype", [jnp.int32, jnp.int64], ids=str)
def test_index_types(idx_dtype):
    data = generate_random_matrix(16, 16, nonzeros_per_row=(1, 4), seed=7)
    A = gt.Csr.from_data(data, index_dtype=idx_dtype)
    assert A.col_idx.dtype == jnp.dtype(idx_dtype)
    b = jnp.ones(16)
    np.testing.assert_allclose(A.apply(b), data.to_dense() @ np.ones(16),
                               rtol=1e-12)


def test_bf16_storage_spmv():
    data = generate_random_matrix(32, 32, nonzeros_per_row=(1, 5), seed=9)
    A = gt.Csr.from_data(data, dtype=jnp.bfloat16)
    assert A.values.dtype == jnp.bfloat16
    y = np.asarray(A.apply(jnp.ones(32, jnp.float32)), np.float64)
    want = data.to_dense() @ np.ones(32)
    assert np.abs(y - want).max() / (np.abs(want).max() + 1) < 0.02


def test_initial_guess_modes():
    A, x_true, b = _sys(jnp.float64)
    crit = Iteration(500) | ResidualNorm(1e-12)
    r0 = Cg.solve(A, b, x0="zero", criteria=crit)
    r1 = Cg.solve(A, b, x0="rhs", criteria=crit)
    r2 = Cg.solve(A, b, x0=x_true, criteria=crit)
    assert bool(r0.converged.all()) and bool(r1.converged.all())
    assert int(r2.iterations[0]) == 0    # provided exact guess
    with pytest.raises(ValueError):
        Cg.solve(A, b, x0="bogus", criteria=crit)


def test_umbrella_namespaces():
    assert gt.solver.Cg is Cg
    assert hasattr(gt.preconditioner, "Jacobi")
    assert hasattr(gt.factorization, "ParIlut")
    assert hasattr(gt.multigrid, "Pgm")
    assert hasattr(gt.reorder, "Rcm")
    assert hasattr(gt.distributed, "Partition")
    assert hasattr(gt.stop, "Iteration")
    assert hasattr(gt.config, "parse")
    assert hasattr(gt.log, "Convergence")
    v = gt.version_info.get()
    assert v["ginkgo_tpu"] == gt.__version__


def test_bf16_matrix_f32_solve():
    """Mixed-precision CG: bf16-stored operator, f32 vectors/arithmetic
    (the fast-kernel path on TPU; reference tier on CPU)."""
    from ginkgo_tpu.utils.generators import stencil_2d
    data = stencil_2d(12, points=5)
    Abf = gt.Csr.from_data(data, dtype=jnp.bfloat16)
    b = jnp.ones(144, jnp.float32)
    res = Cg.solve(Abf, b, criteria=Iteration(2000) | ResidualNorm(1e-4))
    assert bool(res.converged.all())
    x64 = np.linalg.solve(data.to_dense(), np.ones(144))
    np.testing.assert_allclose(np.asarray(res.x, np.float64), x64,
                               rtol=2e-2, atol=2e-2)


def test_f16_storage_spmv():
    data = generate_random_matrix(24, 24, nonzeros_per_row=(1, 4), seed=21)
    A = gt.Csr.from_data(data, dtype=jnp.float16)
    y = np.asarray(A.apply(jnp.ones(24, jnp.float32)), np.float64)
    want = data.to_dense() @ np.ones(24)
    assert np.abs(y - want).max() / (np.abs(want).max() + 1) < 5e-3
