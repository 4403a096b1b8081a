"""distributed-solver example: row-partitioned matrix over a device mesh,
Schwarz-preconditioned CG with all_to_all halo exchange.

Run with XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual
8-device mesh on CPU, or on a real multi-chip TPU slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ginkgo_tpu.distributed import (Partition, Schwarz, distribute_vector,
                                    read_distributed)
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_3d


def main():
    P = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:P]), ("rows",))
    data = stencil_3d(8, points=7)
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(P, n)
    A = read_distributed(data, part, mesh)
    b = distribute_vector(np.ones(n), part, mesh)
    M = Schwarz().generate(A)
    res = Cg.solve(A, b, preconditioner=M,
                   criteria=Iteration(500) | ResidualNorm(1e-10))
    print(f"{P}-device solve: iters={int(res.iterations[0])}, "
          f"converged={bool(res.converged.all())}")
    assert bool(res.converged.all())


if __name__ == "__main__":
    main()
