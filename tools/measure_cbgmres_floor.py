"""CB-GMRES attainable-accuracy floor vs problem size and basis storage.

Round-4 characterization (VERDICT weak #5): sweep n in {32^3, 48^3, 64^3}
x storage in {reduce1=bf16, reduce2, integer=int16, int8} on the 27-pt
Poisson config, f32 value type, GMRES(30), goal rel 1e-6 vs rhs_norm.
Records the TRUE final relative residual and the converged/stagnated
flags (honest semantics from round 4: `converged` only when the true
residual passes; estimate-based stops that the true residual contradicts
are reported `stagnated`).  Reference accessor analysis:
core/solver/cb_gmres.cpp:219-460, cb_gmres_accessor.hpp:56-115.

Run: python tools/measure_cbgmres_floor.py [max_iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main(max_iters=600):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.solver import CbGmres, Gmres
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    from ginkgo_tpu.utils.generators import stencil_3d

    crit = Iteration(max_iters) | ResidualNorm(1e-6, baseline="rhs_norm")
    print(f"{'n':>8} {'storage':>8} {'iters':>6} {'true rel':>10} "
          f"{'conv':>5} {'stag':>5} {'wall s':>7}", flush=True)
    for side in (32, 48, 64):
        data = stencil_3d(side, points=27)
        A = Csr.from_data(data, dtype=np.float32)
        n = A.shape[0]
        b = jnp.ones((n, 1), jnp.float32)
        bnorm = float(jnp.linalg.norm(b))
        for storage in ("keep", "reduce1", "reduce2", "integer", "int8"):
            t0 = time.time()
            if storage == "keep":
                res = Gmres.solve(A, b, krylov_dim=30, criteria=crit)
            else:
                res = CbGmres.solve(A, b, krylov_dim=30,
                                    storage_precision=storage,
                                    criteria=crit)
            wall = time.time() - t0
            r = b - A._apply(res.x)
            rel = float(jnp.linalg.norm(r)) / bnorm
            print(f"{n:>8} {storage:>8} "
                  f"{int(np.asarray(res.iterations)[0]):>6} {rel:>10.2e} "
                  f"{str(bool(np.asarray(res.converged).all())):>5} "
                  f"{str(bool(np.asarray(getattr(res, 'stagnated', False)).any())):>5} "
                  f"{wall:>7.1f}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
