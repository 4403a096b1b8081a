"""inverse-iteration example: smallest eigenpair of an SPD operator via
shifted inverse iteration with an inner CG solve."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main(nx=12, iters=30):
    data = stencil_2d(nx, points=5)
    A = gt.Csr.from_data(data)
    n = A.shape[0]
    crit = Iteration(500) | ResidualNorm(1e-12)
    v = jnp.ones(n) / jnp.sqrt(n)
    for _ in range(iters):
        w = cg.solve(A, v, criteria=crit).x
        v = w / jnp.linalg.norm(w)
    lam = float(v @ A.apply(v))
    exact = np.linalg.eigvalsh(np.asarray(A.to_dense()))[0]
    print(f"smallest eigenvalue: {lam:.8f} (exact {exact:.8f})")
    assert abs(lam - exact) < 1e-6
    return {"eigenvalue_error": abs(lam - exact),
            "eigenvalue_error_bound": 1e-6}


if __name__ == "__main__":
    main()
