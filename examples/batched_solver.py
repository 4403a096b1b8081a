"""batched-solver example: many small independent systems solved in one
vmapped whole-Krylov kernel."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu.batch import BatchBicgstab, BatchCsr, BatchJacobi
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd


def main(num_systems=32, n=24):
    pattern = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 5), seed=0), shift=1.5)
    rng = np.random.default_rng(1)
    values = np.stack([pattern.values * rng.uniform(0.5, 2.0)
                       for _ in range(num_systems)])
    A = BatchCsr.from_data((pattern, values))
    b = rng.standard_normal((num_systems, n))
    solver = BatchBicgstab(max_iterations=200, tolerance=1e-9,
                           preconditioner=BatchJacobi())
    res = solver.solve(A, jnp.asarray(b))
    print(f"{num_systems} systems: all converged={bool(res.converged.all())}"
          f", iters min/max = {int(res.iterations.min())}/"
          f"{int(res.iterations.max())}")
    assert bool(res.converged.all())
    return {"converged": bool(res.converged.all()),
            "iterations": int(res.iterations.max()),
            "residual": float(np.asarray(res.resnorm).max()),
            "residual_bound": 1e-8 * float(np.linalg.norm(b, axis=1).max())}


if __name__ == "__main__":
    main()
