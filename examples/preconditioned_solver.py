"""preconditioned-solver + ilu-preconditioned-solver +
ir-ilu-preconditioned-solver examples: Jacobi- and ILU-preconditioned CG,
plus relaxed (Jacobi-sweep) trisolves inside the ILU apply."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp

import ginkgo_tpu as gt
from ginkgo_tpu.factorization.par_ilu import ParIlu
from ginkgo_tpu.preconditioner.ilu import Ilu
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu.solver import Bicgstab, Cg
from ginkgo_tpu.solver.triangular import LowerTrs, UpperTrs
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main():
    data = stencil_2d(16, points=5)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    crit = Iteration(2000) | ResidualNorm(1e-10)

    plain = Cg.solve(A, b, criteria=crit)
    jac = Cg.solve(A, b, criteria=crit, preconditioner=Jacobi(max_block_size=4))
    ilu = Bicgstab.solve(A, b, criteria=crit, preconditioner=Ilu(ParIlu(8)))
    relaxed = Bicgstab.solve(
        A, b, criteria=crit,
        preconditioner=Ilu(ParIlu(8),
                           l_solver=LowerTrs.build(algorithm="jacobi",
                                                   sweeps=4),
                           u_solver=UpperTrs.build(algorithm="jacobi",
                                                   sweeps=4)))
    for name, r in [("plain cg", plain), ("block-jacobi cg", jac),
                    ("parilu bicgstab", ilu),
                    ("relaxed-trisolve ilu", relaxed)]:
        print(f"{name}: iters={int(r.iterations[0])} "
              f"resnorm={float(r.resnorm[0]):.2e} "
              f"converged={bool(r.converged.all())}")
        assert bool(r.converged.all())
    return {"converged": all(bool(r.converged.all())
                             for r in (plain, jac, ilu, relaxed)),
            "iterations": int(ilu.iterations[0]),
            "residual": float(ilu.resnorm[0]), "residual_bound": 1e-6}


if __name__ == "__main__":
    main()
