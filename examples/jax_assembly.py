"""kokkos-assembly analog: assemble matrix entries with device (jnp) code —
zero-copy interop between user device arrays and the library's formats."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax
import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.matrix.coo import Coo
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


def main(n=64):
    # assemble the 3-point stencil ON DEVICE (the kokkos-assembly pattern:
    # user kernels produce the COO triplets)
    i = jnp.arange(n)

    @jax.jit
    def assemble():
        rows = jnp.concatenate([i, i[1:], i[:-1]])
        cols = jnp.concatenate([i, i[:-1], i[1:]])
        vals = jnp.concatenate([jnp.full((n,), 2.0),
                                jnp.full((n - 1,), -1.0),
                                jnp.full((n - 1,), -1.0)])
        return rows, cols, vals

    rows, cols, vals = assemble()
    # wrap the device arrays directly (no host round trip)
    A = Coo(row_idx=rows.astype(jnp.int32), col_idx=cols.astype(jnp.int32),
            values=vals, shape=(n, n), nnz=int(vals.shape[0]))
    b = jnp.ones(n)
    res = Cg.solve(A, b, criteria=Iteration(500) | ResidualNorm(1e-11))
    print(f"device-assembled solve: iters={int(res.iterations[0])}")
    assert bool(res.converged.all())
    return {"converged": bool(res.converged.all()),
            "iterations": int(res.iterations[0]),
            "residual": float(res.resnorm[0]), "residual_bound": 1e-7}


if __name__ == "__main__":
    main()
