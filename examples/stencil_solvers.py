"""three-pt-stencil-solver + nine-pt-stencil-solver examples: assemble the
classic 1D/2D stencils and solve, verifying second-order convergence."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def solve_3pt(n):
    h = 1.0 / (n + 1)
    xs = np.linspace(h, 1 - h, n)
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], i[1:]])
    cols = np.concatenate([i, i[1:], i[:-1]])
    vals = np.concatenate([np.full(n, 2.0), -np.ones(n - 1),
                           -np.ones(n - 1)]) / h**2
    A = gt.Csr.from_data(gt.MatrixData((n, n), rows, cols, vals))
    u = np.sin(np.pi * xs)
    rhs = np.pi**2 * np.sin(np.pi * xs)
    res = Cg.solve(A, jnp.asarray(rhs),
                   criteria=Iteration(5000) | ResidualNorm(1e-12))
    return np.abs(np.asarray(res.x) - u).max()


def main():
    e1, e2 = solve_3pt(32), solve_3pt(64)
    rate = np.log2(e1 / e2)
    print(f"3-pt stencil errors: {e1:.2e} -> {e2:.2e} "
          f"(order {rate:.2f})")
    assert 1.8 < rate < 2.2          # second-order discretisation

    # nine-pt 2D stencil solve
    data = stencil_2d(20, points=9)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    res = Cg.solve(A, b, criteria=Iteration(2000) | ResidualNorm(1e-10))
    print(f"9-pt stencil: iters={int(res.iterations[0])}")
    assert bool(res.converged.all())
    return {"converged": bool(res.converged.all()),
            "order": float(rate), "order_low": 1.8, "order_high": 2.2,
            "residual": float(res.resnorm[0]), "residual_bound": 1e-6}


if __name__ == "__main__":
    main()
