"""On-device TPU smoke test (run on a TPU host: `python tools/tpu_smoke.py`).

The pytest suite targets the CPU reference tier (tests/conftest.py forces
cpu+x64); this script exercises the same surfaces on the real chip —
banded Pallas SpMV inside solvers, level-scan trisolves, ILU/IC/SSOR/AMG
preconditioned CG, vmapped batch solves, implicit autodiff — in f32.
"""

import os
import sys

# runnable as a plain script: `python tools/tpu_smoke.py` puts tools/ on
# sys.path, not the repo root where the package lives
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ginkgo_tpu import Csr
    from ginkgo_tpu.autodiff import make_differentiable_solve
    from ginkgo_tpu.batch import BatchBicgstab, BatchCsr, BatchJacobi
    from ginkgo_tpu.factorization.par_ilu import ParIlu
    from ginkgo_tpu.preconditioner.ilu import Ic, Ilu
    from ginkgo_tpu.preconditioner.sor import Sor
    from ginkgo_tpu.solver import Cg, Multigrid
    from ginkgo_tpu.solver import cg as cgmod
    from ginkgo_tpu.solver.triangular import LowerTrs
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    from ginkgo_tpu.utils.generators import (generate_random_matrix,
                                             make_spd, stencil_2d)

    print("backend:", jax.default_backend())
    data = stencil_2d(24, points=5)
    A = Csr.from_data(data, dtype=np.float32)
    b = jnp.ones(A.shape[0], jnp.float32)
    crit = Iteration(1000) | ResidualNorm(1e-5)

    rng = np.random.default_rng(0)
    Ld = np.tril(rng.uniform(0.5, 1.5, (64, 64)))
    Ld[rng.uniform(size=(64, 64)) > 0.2] = 0
    np.fill_diagonal(Ld, 2.0)
    Ld = np.tril(Ld)
    op = LowerTrs.build().generate(Csr.from_dense(Ld.astype(np.float32)))
    err = np.abs(Ld @ np.asarray(op.apply(jnp.ones(64, jnp.float32))) - 1
                 ).max()
    assert err < 1e-3, f"trisolve err {err}"
    print("trisolve ok")

    mg = Multigrid.build().generate(A)
    for name, M in [("ic", Ic()), ("parilu", Ilu(ParIlu(8))),
                    ("ssor", Sor(1.3, symmetric=True)),
                    ("amg", mg.cycle_operator())]:
        r = Cg.solve(A, b, criteria=crit, preconditioner=M)
        assert bool(r.converged.all()), name
        print(f"{name}-cg ok ({int(r.iterations[0])} iters)")

    pat = make_spd(generate_random_matrix(
        24, 24, nonzeros_per_row=(2, 5), seed=1), shift=1.5)
    vals = np.stack([pat.values * s for s in (1.0, 2.0, 0.5)]).astype(
        np.float32)
    B = BatchCsr.from_data((pat, vals), dtype=np.float32)
    rb = BatchBicgstab(max_iterations=200, tolerance=1e-5,
                       preconditioner=BatchJacobi(max_block_size=4)
                       ).solve(B, jnp.ones((3, 24), jnp.float32))
    assert bool(rb.converged.all())
    print("batch ok")

    As = Csr.from_data(make_spd(generate_random_matrix(
        16, 16, nonzeros_per_row=(1, 4), seed=2), shift=1.0),
        dtype=np.float32)
    solve = make_differentiable_solve(
        cgmod.solve, criteria=Iteration(300) | ResidualNorm(1e-6))
    g = jax.grad(lambda b: solve(As, b).sum())(jnp.ones(16, jnp.float32))
    assert bool(jnp.isfinite(g).all())
    print("autodiff ok")
    print("ALL TPU SMOKE OK")


if __name__ == "__main__":
    main()
