"""iterative-refinement + mixed-precision-ir examples: outer IR in f64 with
the inner solver running in f32 (precision_dispatch analog)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import Cg, Ir
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd


def main(n=80):
    data = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 6), seed=0), shift=1.0)
    A64 = gt.Csr.from_data(data)                       # f64
    A32 = gt.Csr.from_data(data, dtype=np.float32)     # low-precision inner
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(n)
    b = jnp.asarray(data.to_dense() @ x_true)

    inner = Cg.build(criteria=Iteration(50) | ResidualNorm(1e-4)
                     ).generate(A32)
    res = Ir.solve(A64, b, solver=inner,
                   criteria=Iteration(60) | ResidualNorm(1e-12))
    err = np.abs(np.asarray(res.x) - x_true).max()
    print(f"mixed-precision IR: outer iters={int(res.iterations[0])}, "
          f"max err={err:.2e}")
    assert bool(res.converged.all()) and err < 1e-9
    return {"converged": bool(res.converged.all()),
            "iterations": int(res.iterations[0]),
            "error": float(err), "error_bound": 1e-9}


if __name__ == "__main__":
    main()
