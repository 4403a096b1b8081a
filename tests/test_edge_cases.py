"""Edge-case battery: empty/1x1/singular/degenerate inputs across the
surface (framework-semantics tier, core/test/* spirit)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ginkgo_tpu as gt
from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.solver import Cg, Gmres
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


def test_empty_matrix_formats():
    empty = MatrixData.empty((5, 5))
    for F in (gt.Csr, gt.Coo, gt.Ell, gt.Sellp, gt.Hybrid, gt.SparsityCsr):
        A = F.from_data(empty)
        y = A.apply(jnp.ones(5))
        np.testing.assert_allclose(y, 0.0, err_msg=F.__name__)
        np.testing.assert_allclose(A.to_dense(), 0.0)


def test_1x1_solve():
    A = gt.Csr.from_dense([[4.0]])
    res = Cg.solve(A, jnp.asarray([8.0]),
                   criteria=Iteration(10) | ResidualNorm(1e-14))
    np.testing.assert_allclose(res.x, [2.0])
    assert bool(res.converged.all())


def test_identity_solve_zero_iterations():
    A = gt.Identity(size=4)
    res = Cg.solve(A, jnp.ones(4),
                   criteria=Iteration(10) | ResidualNorm(1e-12))
    # r0 = b, first iteration solves exactly
    assert int(res.iterations[0]) <= 1
    np.testing.assert_allclose(res.x, 1.0)


def test_zero_diagonal_jacobi_guard():
    from ginkgo_tpu.preconditioner.jacobi import Jacobi
    A = gt.Csr.from_dense([[0.0, 1.0], [1.0, 0.0]])
    M = Jacobi().generate(A)     # zero diagonal -> identity fallback
    np.testing.assert_allclose(M.apply(jnp.ones(2)), 1.0)


def test_rectangular_apply_ok_but_solve_rejected():
    A = gt.Csr.from_dense(np.ones((3, 5)))
    y = A.apply(jnp.ones(5))
    np.testing.assert_allclose(y, 5.0)
    with pytest.raises(ValueError):
        Cg.solve(A, jnp.ones(3))


def test_single_entry_matrix():
    data = MatrixData((4, 4), [2], [1], [3.0])
    A = gt.Csr.from_data(data)
    y = np.asarray(A.apply(jnp.asarray([0.0, 2.0, 0.0, 0.0])))
    np.testing.assert_allclose(y, [0, 0, 6.0, 0])


def test_gmres_krylov_dim_one():
    data = MatrixData.diag(np.array([2.0, 3.0, 4.0]))
    A = gt.Csr.from_data(data)
    res = Gmres.solve(A, jnp.ones(3), krylov_dim=1,
                      criteria=Iteration(100) | ResidualNorm(1e-10))
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, [0.5, 1 / 3, 0.25], rtol=1e-8)


def test_duplicate_assembly_sums():
    data = MatrixData((2, 2), [0, 0, 1], [0, 0, 1], [1.0, 2.0, 5.0])
    A = gt.Csr.from_data(data)
    np.testing.assert_allclose(A.to_dense(), [[3.0, 0], [0, 5.0]])
    assert A.nnz == 2


def test_explicit_zeros_removed():
    data = MatrixData((2, 2), [0, 1], [0, 1], [1.0, 0.0])
    A = gt.Coo.from_data(data)
    assert A.nnz == 1


def test_multivector_rank_checks():
    A = gt.Csr.from_dense(np.eye(3))
    with pytest.raises(ValueError):
        A.apply(jnp.ones((3, 2, 2)))
    with pytest.raises(ValueError):
        A.apply(jnp.ones(4))


def test_combined_criterion_empty_rejected():
    from ginkgo_tpu.stop.criterion import as_criterion
    with pytest.raises(ValueError):
        as_criterion(None)
    with pytest.raises(TypeError):
        as_criterion("iterate a lot")


def test_partition_empty_part():
    from ginkgo_tpu.distributed import Partition
    p = Partition.build_from_contiguous([0, 3, 3, 6])   # middle part empty
    assert p.num_parts == 3
    assert p.part_sizes()[1] == 0
    np.testing.assert_array_equal(p.owner_of([2, 3, 5]), [0, 2, 2])


def test_fbcsr_non_multiple_block_size():
    data = MatrixData((5, 5), [0, 4, 2], [0, 4, 3], [1.0, 2.0, 3.0])
    A = gt.Fbcsr.from_data(data, block_size=2)
    np.testing.assert_allclose(A.to_dense(), data.to_dense())
    b = np.random.default_rng(0).standard_normal(5)
    np.testing.assert_allclose(A.apply(jnp.asarray(b)),
                               data.to_dense() @ b, rtol=1e-12)


def test_typed_exception_hierarchy():
    """Typed exceptions (exception.hpp analog) surface from the matching
    check sites and stay catchable as their builtin bases."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    import ginkgo_tpu as gt
    from ginkgo_tpu.base.matrix_data import MatrixData

    d = MatrixData((3, 3), np.array([0, 1, 2]), np.array([0, 1, 2]),
                   np.array([1.0, 2.0, 3.0]))
    A = gt.Csr.from_data(d)
    with pytest.raises(gt.DimensionMismatch):
        A.apply(jnp.ones(5))
    assert issubclass(gt.DimensionMismatch, ValueError)
    with pytest.raises(gt.BadDimension):
        A.apply(jnp.ones((3, 1, 1)))
    nodiag = MatrixData((3, 3), np.array([0, 1, 2]), np.array([1, 1, 2]),
                        np.array([1.0, 2.0, 3.0]))
    with pytest.raises(gt.UnsupportedMatrixProperty):
        gt.Csr.from_data(nodiag).add_scaled_identity(1.0, 1.0)
    from ginkgo_tpu.config import parse
    with pytest.raises(gt.NotSupportedError):
        parse({"type": "solver::Bogus"})
    from ginkgo_tpu.distributed import IndexMap, Partition
    p = Partition.build_from_global_size_uniform(2, 8)
    im = IndexMap.build(p, 0, np.array([6]))
    with pytest.raises(gt.OutOfBoundsError):
        im.map_to_local([5])          # owned by part 1, not in map
    assert issubclass(gt.OutOfBoundsError, IndexError)
