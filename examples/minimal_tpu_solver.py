"""minimal-cuda-solver analog: the smallest possible TPU solve — everything
on whatever accelerator jax.default_backend() provides."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp

from ginkgo_tpu import Csr
from ginkgo_tpu.solver import cg

A = Csr.from_dense([[2.0, -1, 0], [-1, 2, -1], [0, -1, 2]])
x = cg.solve(A, jnp.ones(3)).x
# exact solution of this tridiagonal system is [1.5, 2, 1.5]
assert float(jnp.abs(x.reshape(-1) - jnp.asarray([1.5, 2.0, 1.5])).max()) < 1e-8


def main():
    err = float(jnp.abs(x.reshape(-1) - jnp.asarray([1.5, 2.0, 1.5])).max())
    return {"error": err, "error_bound": 1e-8}


if __name__ == "__main__":
    print("x =", x)
