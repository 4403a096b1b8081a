"""ParILUT at scale: the symbolic phase must be vectorized (sorted-key
merges + scipy C products — no per-entry Python), so generate on a
32k-row 27-pt stencil completes in seconds and the factors actually
precondition (par_ilut.cpp:262-350 parity at sizes the old dict-based
implementation could not reach)."""

import time

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu.factorization.par_ilut import ParIlut
from ginkgo_tpu.matrix.csr import Csr
from ginkgo_tpu.preconditioner.ilu import Ilu
from ginkgo_tpu.solver import Bicgstab
from ginkgo_tpu.stop import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_3d


def test_parilut_generate_32k_stencil():
    data = stencil_3d(32, points=27)         # n=32768, nnz=830k
    t0 = time.time()
    fact = ParIlut(iterations=2, fill_in_limit=2.0).generate(data)
    elapsed = time.time() - t0
    L, U = fact.unpack()
    n = data.shape[0]
    assert L.shape == (n, n) and U.shape == (n, n)
    # fill stays within the budget (+ diagonal slack)
    d = data.canonical()
    nnz0 = d.nnz
    assert L.nnz + U.nnz < 2.0 * 1.2 * nnz0 + 2 * n
    # wall guard: generous bound that still catches a per-entry
    # host-loop regression (dict-based version needed minutes)
    assert elapsed < 120, f"ParILUT generate too slow: {elapsed:.0f}s"


def test_parilut_preconditions_at_scale():
    data = stencil_3d(16, points=27)         # n=4096
    A = Csr.from_data(data)
    n = A.shape[0]
    b = jnp.ones(n)
    crit = [Iteration(300), ResidualNorm(1e-8)]
    plain = Bicgstab.solve(A, b, criteria=crit)
    pre = Ilu(factorization=ParIlut(iterations=2))
    precond = Bicgstab.solve(A, b, criteria=crit, preconditioner=pre)
    it_plain = int(np.asarray(plain.iterations).max())
    it_pre = int(np.asarray(precond.iterations).max())
    assert bool(np.asarray(precond.converged).all())
    assert it_pre < it_plain
