"""2-D block-distributed operator tests (virtual 8-device mesh as 4x2 /
2x4 grids) — SpMV and full solves must match the single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import ginkgo_tpu as gt
from ginkgo_tpu.distributed import (Partition, distribute_vector_2d,
                                    read_distributed_2d)
from ginkgo_tpu.solver import Bicgstab, Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import (generate_random_matrix, make_spd,
                                         stencil_3d)


def _mesh(pr, pc):
    devs = np.array(jax.devices()[:pr * pc]).reshape(pr, pc)
    return Mesh(devs, ("rows", "cols"))


@pytest.mark.parametrize("grid", [(2, 4), (4, 2), (2, 2)])
def test_spmv_matches_serial(grid):
    pr, pc = grid
    data = stencil_3d(8, points=27)
    n = data.shape[0]
    mesh = _mesh(pr, pc)
    rp = Partition.build_from_global_size_uniform(pr, n)
    cp = Partition.build_from_global_size_uniform(pc, n)
    A = read_distributed_2d(data, rp, mesh, col_partition=cp)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 2))
    xd = distribute_vector_2d(x, cp, mesh, axis="cols")
    y = jax.jit(lambda A, x: A.apply(x))(A, xd)
    # result is row-partition padded
    y_nat = rp.from_padded(np.asarray(y))
    want = data.to_dense() @ x
    np.testing.assert_allclose(y_nat, want, rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(A.to_dense()), data.to_dense(),
                               rtol=1e-14)


def test_cg_solve_through_2d_operator():
    """Square same-partition case: solvers run unchanged (psum dots, the
    row<->col reshard inserted by XLA between iterations)."""
    data = stencil_3d(8, points=27)
    n = data.shape[0]
    mesh = _mesh(2, 4)
    rp = Partition.build_from_global_size_uniform(2, n)
    cp = Partition.build_from_global_size_uniform(4, n)
    A = read_distributed_2d(data, rp, mesh, col_partition=cp)
    # rows layout must equal cols layout length for the solver's vectors:
    # use the same uniform padded length
    assert rp.padded_size == cp.padded_size == n  # 512 divides evenly
    b = distribute_vector_2d(np.ones(n), cp, mesh, axis="cols")
    crit = Iteration(2000) | ResidualNorm(1e-12)
    res = Cg.solve(A, b, criteria=crit)
    assert bool(res.converged.all())
    single = Cg.solve(gt.Csr.from_data(data, strategy="classical"),
                      jnp.ones(n), criteria=crit)
    np.testing.assert_allclose(np.asarray(res.x).ravel(),
                               np.asarray(single.x).ravel(),
                               rtol=1e-9, atol=1e-9)


def test_bicgstab_nonsymmetric_2d():
    n = 120
    rng = np.random.default_rng(1)
    data = generate_random_matrix(n, n, nonzeros_per_row=(2, 5), seed=1)
    dense = data.to_dense() + np.diag(6 + rng.uniform(0, 1, n))
    from ginkgo_tpu.base.matrix_data import MatrixData
    data = MatrixData.from_dense(dense)
    mesh = _mesh(2, 2)
    rp = Partition.build_from_global_size_uniform(2, n)
    A = read_distributed_2d(data, rp, mesh)
    b = distribute_vector_2d(np.ones(n), rp, mesh, axis="cols")
    res = Bicgstab.solve(A, b, criteria=Iteration(2000) | ResidualNorm(1e-11))
    assert bool(res.converged.all())
    x = rp.from_padded(np.asarray(res.x))
    np.testing.assert_allclose(dense @ x.ravel(), np.ones(n), rtol=1e-7,
                               atol=1e-7)


def test_padded_sizes_work_when_they_agree():
    """n=7 on a 2x4 grid: both partitions pad to 8; the operator's shape is
    the padded one so vectors conform, and to_dense maps interleaved pad
    slots back to natural order."""
    rng = np.random.default_rng(3)
    dense = rng.standard_normal((7, 7))
    dense[np.abs(dense) < 0.5] = 0.0
    dense = 0.5 * (dense + dense.T)       # CG needs SPD
    np.fill_diagonal(dense, 4.0)
    from ginkgo_tpu.base.matrix_data import MatrixData
    data = MatrixData.from_dense(dense)
    mesh = _mesh(2, 4)
    rp = Partition.build_from_global_size_uniform(2, 7)   # padded 8
    cp = Partition.build_from_global_size_uniform(4, 7)   # padded 8
    A = read_distributed_2d(data, rp, mesh, col_partition=cp)
    assert A.shape == (8, 8) and A.global_shape == (7, 7)
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=1e-14)
    b = distribute_vector_2d(np.ones(7), cp, mesh, axis="cols")
    res = Cg.solve(A, b, criteria=Iteration(200) | ResidualNorm(1e-12))
    x = rp.from_padded(np.asarray(res.x))
    np.testing.assert_allclose(dense @ x.ravel(), np.ones(7), rtol=1e-9)


def test_mismatched_padded_sizes_raise():
    import ginkgo_tpu as gt
    data = stencil_3d(7, points=7)                            # n=343
    rp = Partition.build_from_contiguous([0, 115, 230, 343])  # padded 345
    cp = Partition.build_from_global_size_uniform(2, 343)     # padded 344
    mesh = Mesh(np.array(jax.devices()[:6]).reshape(3, 2), ("rows", "cols"))
    with pytest.raises(gt.ValueMismatch, match="padded"):
        read_distributed_2d(data, rp, mesh, col_partition=cp)


def test_mesh_shape_validation():
    data = stencil_3d(4, points=7)
    mesh = _mesh(2, 4)
    rp = Partition.build_from_global_size_uniform(4, 64)
    with pytest.raises(ValueError, match="mesh axes"):
        read_distributed_2d(data, rp, mesh)   # Pr=4 vs mesh rows=2
