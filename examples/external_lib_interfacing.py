"""external-lib-interfacing example (deal.II analog -> torch): assemble a
system in PyTorch, move it zero-copy via dlpack, solve with ginkgo_tpu, and
hand the solution back to torch."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


def main(n=64):
    import jax.dlpack
    import torch

    # --- external library assembles the problem (torch, CPU) ---
    main_diag = torch.full((n,), 2.0, dtype=torch.float32)
    off = torch.full((n - 1,), -1.0, dtype=torch.float32)
    i = torch.arange(n)
    rows = torch.cat([i, i[:-1], i[1:]])
    cols = torch.cat([i, i[1:], i[:-1]])
    vals = torch.cat([main_diag, off, off])
    b_torch = torch.ones(n, dtype=torch.float32)

    # --- zero-copy into JAX (dlpack), wrap as a ginkgo_tpu operator ---
    import jax.numpy as jnp
    to_jax = lambda t: jnp.from_dlpack(t.contiguous())   # noqa: E731
    from ginkgo_tpu.matrix.coo import Coo
    A = Coo(row_idx=to_jax(rows.to(torch.int32)),
            col_idx=to_jax(cols.to(torch.int32)),
            values=to_jax(vals), shape=(n, n), nnz=int(vals.shape[0]))
    b = to_jax(b_torch)

    # 1e-6 relative: attainable at f32 (the solver audits convergence on
    # the TRUE residual; 1e-10 would be below the f32 floor and honestly
    # reported as stagnation)
    res = Cg.solve(A, b, criteria=Iteration(500) | ResidualNorm(1e-6))

    # --- hand the solution back to torch ---
    x_torch = torch.from_dlpack(res.x)
    resid = torch.linalg.norm(b_torch - torch.from_dlpack(A.apply(res.x)))
    print(f"torch-side residual: {float(resid):.2e}, "
          f"x[0]={float(x_torch[0]):.4f}")
    assert float(resid) < 1e-4
    # 3-pt Poisson with ones rhs: symmetric positive bump
    x_np = x_torch.numpy()
    assert np.allclose(x_np, x_np[::-1], atol=1e-4)
    assert (x_np > 0).all()
    return {"converged": bool(res.converged.all()),
            "residual": float(resid), "residual_bound": 1e-4,
            "symmetry_error": float(np.abs(x_np - x_np[::-1]).max()),
            "symmetry_error_bound": 1e-4}


if __name__ == "__main__":
    main()
