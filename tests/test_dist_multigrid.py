"""Distributed multigrid + batch block-Jacobi
(distributed-multigrid-preconditioned-solver example analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ginkgo_tpu.distributed import Partition, distribute_vector, \
    read_distributed
from ginkgo_tpu.multigrid.distributed_pgm import DistributedPgm
from ginkgo_tpu.solver import Cg, Multigrid
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def _mesh(P):
    return Mesh(np.array(jax.devices()[:P]), ("rows",))


@pytest.mark.slow
def test_distributed_multigrid_solver():
    data = stencil_2d(16, points=5)
    n = 256
    P = 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    mg = Multigrid.build(mg_level=DistributedPgm(),
                         criteria=Iteration(100) | ResidualNorm(1e-9)
                         ).generate(A)
    assert len(mg.levels) >= 2
    b = distribute_vector(np.ones(n), part, mesh)
    res = mg.solve(b)
    assert bool(res.converged.all())
    serial = np.linalg.solve(data.to_dense(), np.ones(n))
    np.testing.assert_allclose(part.from_padded(np.asarray(res.x)), serial,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_distributed_multigrid_preconditioned_cg():
    data = stencil_2d(16, points=5)
    n = 256
    P = 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    crit = Iteration(300) | ResidualNorm(1e-10)
    b = distribute_vector(np.ones(n), part, mesh)
    plain = Cg.solve(A, b, criteria=crit)
    mg = Multigrid.build(mg_level=DistributedPgm()).generate(A)
    prec = Cg.solve(A, b, criteria=crit, preconditioner=mg.cycle_operator())
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0])


def test_batch_block_jacobi():
    from ginkgo_tpu.batch import BatchCg, BatchCsr, BatchJacobi
    from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd
    pattern = make_spd(generate_random_matrix(
        24, 24, nonzeros_per_row=(2, 5), seed=0), shift=1.0)
    rng = np.random.default_rng(1)
    values = np.stack([pattern.values * rng.uniform(0.5, 2.0)
                       for _ in range(4)])
    A = BatchCsr.from_data((pattern, values))
    x_true = rng.standard_normal((4, 24))
    b = np.einsum("bnm,bm->bn", np.asarray(A.to_dense_batch()), x_true)
    solver = BatchCg(max_iterations=300, tolerance=1e-10,
                     preconditioner=BatchJacobi(max_block_size=4))
    res = solver.solve(A, jnp.asarray(b))
    assert bool(res.converged.all())
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6, atol=1e-7)
