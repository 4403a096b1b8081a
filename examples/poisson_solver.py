"""poisson-solver example: assemble a 1D 3-point Poisson problem with
boundary conditions and verify against the analytic solution u(x)=x^3."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


def main(n=100):
    h = 1.0 / (n + 1)
    xs = np.linspace(h, 1 - h, n)
    u = lambda x: x ** 3                  # noqa: E731
    f = lambda x: 6 * x                   # -u'' = -6x ... u''=6x; rhs=-u''
    # assemble tridiagonal (1/h^2)[-1 2 -1]
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], i[1:]])
    cols = np.concatenate([i, i[1:], i[:-1]])
    vals = np.concatenate([np.full(n, 2.0), np.full(n - 1, -1.0),
                           np.full(n - 1, -1.0)]) / h**2
    A = gt.Csr.from_data(gt.MatrixData((n, n), rows, cols, vals))
    rhs = -f(xs)
    rhs[0] += u(0) / h**2
    rhs[-1] += u(1.0) / h**2
    res = Cg.solve(A, jnp.asarray(rhs),
                   criteria=Iteration(2000) | ResidualNorm(1e-12))
    err = np.abs(np.asarray(res.x) - u(xs)).max()
    print(f"max error vs analytic: {err:.3e}")
    assert err < 1e-4
    return {"converged": bool(res.converged.all()),
            "iterations": int(res.iterations[0]),
            "error": float(err), "error_bound": 1e-4}


if __name__ == "__main__":
    main()
