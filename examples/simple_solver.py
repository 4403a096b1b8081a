"""simple-solver example (examples/simple-solver/simple-solver.cpp analog):
read a matrix, solve with CG, print the residual."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


def main():
    # the reference reads data/A.mtx; we assemble the same 19x19 default or
    # a 3D stencil when run standalone
    from ginkgo_tpu.utils.generators import stencil_3d
    data = stencil_3d(8, points=27)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    solver = Cg.build(criteria=Iteration(1000) | ResidualNorm(1e-10)
                      ).generate(A)
    x = solver.apply(b)
    res = float(jnp.linalg.norm(b - A.apply(x)))
    print(f"residual norm: {res:.3e}")
    assert res < 1e-8 * float(jnp.linalg.norm(b))
    return {"residual": res,
            "residual_bound": 1e-8 * float(jnp.linalg.norm(b))}


if __name__ == "__main__":
    main()
