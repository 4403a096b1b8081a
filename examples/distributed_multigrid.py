"""distributed-multigrid-preconditioned-solver example: AMG-preconditioned
CG on a row-sharded operator (sharded fine level, replicated coarse grids),
plus the two-level Schwarz variant."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ginkgo_tpu.distributed import (Partition, Schwarz, distribute_vector,
                                    read_distributed)
from ginkgo_tpu.multigrid.distributed_pgm import DistributedPgm
from ginkgo_tpu.solver import Cg, Multigrid
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main():
    P = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:P]), ("rows",))
    data = stencil_2d(16, points=5)
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(P, n)
    A = read_distributed(data, part, mesh)
    b = distribute_vector(np.ones(n), part, mesh)
    crit = Iteration(300) | ResidualNorm(1e-10)

    mg = Multigrid.build(mg_level=DistributedPgm()).generate(A)
    amg = Cg.solve(A, b, criteria=crit, preconditioner=mg.cycle_operator())
    two_level = Cg.solve(
        A, b, criteria=crit,
        preconditioner=Schwarz(coarse_level=DistributedPgm()).generate(A))
    print(f"{P}-device AMG-CG: {int(amg.iterations[0])} iters; "
          f"two-level Schwarz-CG: {int(two_level.iterations[0])} iters")
    assert bool(amg.converged.all()) and bool(two_level.converged.all())
    return {"converged": bool(amg.converged.all())
            and bool(two_level.converged.all()),
            "amg_residual": float(amg.resnorm[0]),
            "amg_residual_bound": 1e-6,
            "iterations": int(amg.iterations[0])}


if __name__ == "__main__":
    main()
