"""custom-matrix-format example: a user-defined stencil operator (no stored
matrix at all — apply is a fused shift computation) plugged into CG."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu.base.linop import LinOp, linop_dataclass, static_field
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


@linop_dataclass
class Stencil1D(LinOp):
    """Matrix-free 3-point stencil [-1, 2, -1]."""

    n: int = static_field()

    @property
    def shape(self):
        return (self.n, self.n)

    def _apply(self, b):
        up = jnp.pad(b[1:], ((0, 1), (0, 0)))
        down = jnp.pad(b[:-1], ((1, 0), (0, 0)))
        return 2 * b - up - down


def main(n=64):
    A = Stencil1D(n=n)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A.apply(x_true)
    res = Cg.solve(A, b, criteria=Iteration(500) | ResidualNorm(1e-12))
    err = float(jnp.abs(res.x - x_true).max())
    print(f"matrix-free stencil CG: iters={int(res.iterations[0])}, "
          f"err={err:.2e}")
    assert err < 1e-8
    return {"converged": bool(res.converged.all()),
            "iterations": int(res.iterations[0]),
            "error": err, "error_bound": 1e-8}


if __name__ == "__main__":
    main()
