"""multigrid-preconditioned-solver (+ customized variant): CG with one AMG
V-cycle as preconditioner; the customized variant swaps cycle type and
smoother parameters (multigrid-preconditioned-solver-customized analog)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp

import ginkgo_tpu as gt
from ginkgo_tpu.multigrid.pgm import Pgm
from ginkgo_tpu.solver import Cg, Multigrid
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main():
    data = stencil_2d(24, points=5)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    crit = Iteration(500) | ResidualNorm(1e-10)

    plain = Cg.solve(A, b, criteria=crit)
    mg = Multigrid.build().generate(A)
    amg = Cg.solve(A, b, criteria=crit, preconditioner=mg.cycle_operator())
    # customized: W-cycle, more aggressive coarsening
    mg_w = Multigrid.build(cycle="w",
                           mg_level=Pgm(max_iterations=20,
                                        max_unassigned_ratio=0.02),
                           min_coarse_rows=8).generate(A)
    amg_w = Cg.solve(A, b, criteria=crit,
                     preconditioner=mg_w.cycle_operator())
    print(f"plain: {int(plain.iterations[0])}, v-cycle AMG: "
          f"{int(amg.iterations[0])}, customized w-cycle: "
          f"{int(amg_w.iterations[0])}")
    assert int(amg.iterations[0]) <= int(plain.iterations[0])
    assert bool(amg_w.converged.all())
    return {"converged": bool(amg.converged.all())
            and bool(amg_w.converged.all()),
            "iterations": int(amg.iterations[0]),
            "iterations_bound": int(plain.iterations[0]),
            "residual": float(amg.resnorm[0]), "residual_bound": 1e-6}


if __name__ == "__main__":
    main()
