"""minimal-cuda-solver analog: the smallest possible TPU solve — everything
on whatever accelerator jax.default_backend() provides."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # runnable as a plain script
import jax as _jax
_jax.config.update("jax_enable_x64", True)  # reference-parity f64

import jax.numpy as jnp

from ginkgo_tpu import Csr
from ginkgo_tpu.solver import cg

A = Csr.from_dense([[2.0, -1, 0], [-1, 2, -1], [0, -1, 2]])
x = cg.solve(A, jnp.ones(3)).x

if __name__ == "__main__":
    print("x =", x)
