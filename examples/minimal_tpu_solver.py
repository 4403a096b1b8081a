"""minimal-cuda-solver analog: the smallest possible TPU solve — everything
on whatever accelerator jax.default_backend() provides."""

import jax.numpy as jnp

from ginkgo_tpu import Csr
from ginkgo_tpu.solver import cg

A = Csr.from_dense([[2.0, -1, 0], [-1, 2, -1], [0, -1, 2]])
x = cg.solve(A, jnp.ones(3)).x

if __name__ == "__main__":
    print("x =", x)
