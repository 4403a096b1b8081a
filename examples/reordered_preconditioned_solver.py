"""reordered-preconditioned-solver + par-ilu-convergence +
preconditioner-export examples: RCM-reordered IC-preconditioned CG,
ParILU sweep-count convergence study, factor export to MatrixMarket."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import tempfile

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.factorization.par_ilu import Ilu0, ParIlu
from ginkgo_tpu.preconditioner.ilu import Ic
from ginkgo_tpu.reorder import Rcm
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main():
    data = stencil_2d(14, points=5)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    crit = Iteration(1000) | ResidualNorm(1e-10)

    # reordered-preconditioned-solver: permute, precondition, solve, unpermute
    perm = Rcm.build().generate(A)
    Ar = A.permute(np.asarray(perm.perm))
    br = perm.apply(b)
    res = Cg.solve(Ar, br, criteria=crit, preconditioner=Ic())
    x = perm.inverse().apply(res.x)
    resid = float(jnp.linalg.norm(b - A.apply(x)))
    print(f"rcm+ic cg: iters={int(res.iterations[0])}, true resid={resid:.2e}")
    assert resid < 1e-7

    # par-ilu-convergence: ||A - LU||_F vs sweep count (monotone-ish)
    exact = Ilu0().generate(A)
    dense = np.asarray(A.to_dense())
    errs = []
    for sweeps in (1, 3, 8, 20):
        f = ParIlu(iterations=sweeps).generate(A)
        lu = np.asarray(f.l_factor.to_dense()) @ np.asarray(
            f.u_factor.to_dense())
        errs.append(np.linalg.norm(dense - lu))
        print(f"par-ilu sweeps={sweeps}: ||A - LU||_F = {errs[-1]:.3e}")
    assert errs[-1] <= errs[0]

    # preconditioner-export: write the factors out
    with tempfile.NamedTemporaryFile(suffix=".mtx", mode="w") as f:
        gt.write_mtx(f.name, exact.l_factor.to_matrix_data())
        back = gt.read_mtx(f.name)
        assert back.nnz == exact.l_factor.nnz
    print("factor export round-trip ok")
    return {"residual": resid, "residual_bound": 1e-7,
            "parilu_final_error": float(errs[-1]),
            "parilu_final_error_bound": float(errs[0])}


if __name__ == "__main__":
    main()
