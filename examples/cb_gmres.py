"""cb-gmres example: GMRES with a compressed (reduced-precision) Krylov
basis — storage in bf16/int16 while arithmetic stays f64."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import CbGmres, Gmres
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import generate_random_matrix


def main():
    data = generate_random_matrix(100, 100, nonzeros_per_row=(2, 6), seed=0)
    dense = data.to_dense()
    dense += np.diag(np.abs(dense).sum(1) + 1)
    A = gt.Csr.from_dense(dense)
    b = jnp.ones(100)
    crit = Iteration(500) | ResidualNorm(1e-8)
    out = {}
    for storage in ("keep", "reduce1", "integer"):
        res = CbGmres.solve(A, b, storage_precision=storage, criteria=crit)
        print(f"storage={storage}: iters={int(res.iterations[0])} "
              f"resnorm={float(res.resnorm[0]):.2e}")
        assert bool(res.converged.all()), storage
        out[f"{storage}_residual"] = float(
            np.linalg.norm(np.asarray(b) - dense @ np.asarray(res.x)))
        # integer basis storage is deliberately lossy (the point of the
        # example): it converges, at a coarser attainable residual
        tol = 1e-3 if storage == "integer" else 1e-7
        out[f"{storage}_residual_bound"] = tol * float(np.linalg.norm(b))
    return dict(out, converged=True)


if __name__ == "__main__":
    main()
