"""Two-level Schwarz (coarse correction) + mixed-precision multigrid
(distributed-multigrid + mixed-multigrid example analogs)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ginkgo_tpu import Csr
from ginkgo_tpu.distributed import Partition, Schwarz, distribute_vector, \
    read_distributed
from ginkgo_tpu.multigrid.distributed_pgm import DistributedPgm
from ginkgo_tpu.solver import Cg, Multigrid
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def _mesh(P):
    return Mesh(np.array(jax.devices()[:P]), ("rows",))


@pytest.mark.slow
def test_two_level_schwarz():
    data = stencil_2d(16, points=5)
    n, P = 256, 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    b = distribute_vector(np.ones(n), part, mesh)
    crit = Iteration(500) | ResidualNorm(1e-10)
    M = Schwarz(coarse_level=DistributedPgm()).generate(A)
    two_level = Cg.solve(A, b, criteria=crit, preconditioner=M)
    assert bool(two_level.converged.all())
    serial = np.linalg.solve(data.to_dense(), np.ones(n))
    np.testing.assert_allclose(part.from_padded(np.asarray(two_level.x)),
                               serial, rtol=1e-6, atol=1e-7)
    # the operator is the documented additive sum: M b = AS b + P Ac^-1 R b
    r = np.random.default_rng(0).standard_normal(n)
    rs = distribute_vector(r, part, mesh)
    one_level = Schwarz().generate(A)
    got = part.from_padded(np.asarray(M.apply(rs)))
    as_part = part.from_padded(np.asarray(one_level.apply(rs)))
    # coarse part via dense oracle
    agg_P = np.asarray(M.coarse_prolong.inner.agg if hasattr(
        M.coarse_prolong, "inner") else M.coarse_prolong.agg)
    Pmat = np.zeros((n, agg_P.max() + 1))
    Pmat[np.arange(n), agg_P] = 1.0
    Ac = Pmat.T @ data.to_dense() @ Pmat
    want = as_part + Pmat @ np.linalg.solve(Ac, Pmat.T @ r)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_mixed_precision_multigrid():
    data = stencil_2d(16, points=5)
    A = Csr.from_data(data)              # f64 fine level
    mg = Multigrid.build(coarse_dtype=jnp.float32,
                         criteria=Iteration(100) | ResidualNorm(1e-9)
                         ).generate(A)
    assert len(mg.levels) >= 1
    # coarse operators really stored at reduced precision
    assert mg.levels[0].coarse_op.values.dtype == jnp.float32
    b = jnp.ones(A.shape[0])
    res = mg.solve(b)
    assert bool(res.converged.all())
    serial = np.linalg.solve(data.to_dense(), np.ones(A.shape[0]))
    np.testing.assert_allclose(np.asarray(res.x), serial, rtol=1e-5,
                               atol=1e-6)


def test_mixed_multigrid_as_preconditioner():
    data = stencil_2d(20, points=5)
    A = Csr.from_data(data)
    crit = Iteration(300) | ResidualNorm(1e-10)
    mg = Multigrid.build(coarse_dtype=jnp.float32).generate(A)
    res = Cg.solve(A, jnp.ones(400), criteria=crit,
                   preconditioner=mg.cycle_operator())
    assert bool(res.converged.all())
