"""On-chip preconditioner/multigrid cost measurement.

Per-iteration cost of CG under each preconditioner at n=262k (27-pt
Poisson), plus total iterations to 1e-6 — the apply cost AND the
convergence value together (benchmark/preconditioner records apply-only).
Chain timing via Iteration-capped windows (see CLAUDE.md).
Run: python tools/measure_precond.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ginkgo_tpu import Csr
    from ginkgo_tpu.multigrid.pgm import Pgm
    from ginkgo_tpu.preconditioner.ilu import Ic, Ilu
    from ginkgo_tpu.preconditioner.isai import Isai
    from ginkgo_tpu.preconditioner.jacobi import Jacobi
    from ginkgo_tpu.preconditioner.sor import GaussSeidel
    from ginkgo_tpu.solver import Cg, Multigrid
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    from ginkgo_tpu.utils.generators import stencil_3d

    data = stencil_3d(64, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    b = jnp.ones((n, 1), jnp.float32)

    def per_iter_and_conv(precond, name, lo=4, hi=54):
        t0 = time.time()
        M = (precond.generate(A) if hasattr(precond, "generate")
             else precond)
        gen_s = time.time() - t0

        def timed(it):
            f = jax.jit(lambda A, b: Cg.solve(
                A, b, preconditioner=M,
                criteria=Iteration(it)).x.sum())
            float(f(A, b))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(A, b))
                best = min(best, time.perf_counter() - t0)
            return best

        us = (timed(hi) - timed(lo)) / (hi - lo) * 1e6
        res = Cg.solve(A, b, preconditioner=M,
                       criteria=Iteration(2000)
                       | ResidualNorm(1e-6, baseline="rhs_norm"))
        iters = int(np.asarray(res.iterations)[0])
        print(f"{name:16s} gen {gen_s:6.1f}s  {us:7.1f} us/iter  "
              f"iters {iters:4d}  total {us*iters/1e3:7.1f} ms",
              flush=True)

    from ginkgo_tpu.solver import LowerTrs, UpperTrs

    per_iter_and_conv(None, "none")
    per_iter_and_conv(Jacobi(), "jacobi")
    per_iter_and_conv(Isai(mode="spd"), "isai(spd)")
    per_iter_and_conv(Ic(l_solver=LowerTrs.build(algorithm="jacobi",
                                                 sweeps=6),
                         u_solver=UpperTrs.build(algorithm="jacobi",
                                                 sweeps=6)),
                      "ic(0)+sweeps(6)")
    per_iter_and_conv(GaussSeidel(), "gauss-seidel", lo=2, hi=12)
    mg = Multigrid.build(max_levels=6, min_coarse_rows=512).generate(A)
    per_iter_and_conv(mg.cycle_operator(), "multigrid-V", lo=2, hi=12)
    per_iter_and_conv(Ic(), "ic(0)+level", lo=2, hi=8)


if __name__ == "__main__":
    main()
