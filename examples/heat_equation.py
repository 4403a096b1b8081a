"""heat-equation example: implicit-Euler time stepping of the 2D heat
equation, one CG solve per step, all inside one jitted scan."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax
import jax.numpy as jnp

import ginkgo_tpu as gt
from ginkgo_tpu.solver import cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main(nx=24, steps=20, dt=1e-3, kappa=1.0):
    n = nx * nx
    data = stencil_2d(nx, points=5)
    lap = gt.Csr.from_data(data)                 # -Laplacian (SPD)
    # (I + dt*kappa*L) u_{k+1} = u_k
    sys = gt.Csr.from_data(
        gt.MatrixData.diag(jnp.ones(n)).sum_duplicates()).spgeam(
        1.0, dt * kappa * (nx + 1) ** 2, lap)
    crit = Iteration(400) | ResidualNorm(1e-10)

    xs = jnp.linspace(0, 1, nx)
    u0 = (jnp.exp(-50 * ((xs[:, None] - 0.5) ** 2
                         + (xs[None, :] - 0.5) ** 2))).reshape(n)

    @jax.jit
    def run(u0):
        def step(u, _):
            u = cg.solve(sys, u, criteria=crit).x
            return u, u.max()
        return jax.lax.scan(step, u0, None, length=steps)

    u, peaks = run(u0)
    print(f"peak temperature: {float(peaks[0]):.4f} -> "
          f"{float(peaks[-1]):.4f} (diffusing)")
    assert float(peaks[-1]) < float(peaks[0])
    assert float(u.min()) > -1e-8   # maximum principle (no undershoot)
    return {"final_peak": float(peaks[-1]),
            "final_peak_bound": float(peaks[0]),
            "undershoot": -float(u.min()), "undershoot_bound": 1e-8}


if __name__ == "__main__":
    main()
