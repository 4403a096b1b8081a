"""mixed-spmv example: bf16-stored matrix applied to f32 vectors with f32
accumulation — the storage/arithmetic split on the SpMV itself."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.utils.generators import stencil_2d


def main():
    data = stencil_2d(32, points=9)
    A64 = gt.Csr.from_data(data)
    Abf = gt.Csr.from_data(data, dtype=jnp.bfloat16)
    x = jnp.ones(A64.shape[0], jnp.float32)
    exact = np.asarray(A64.apply(np.asarray(x, np.float64)))
    mixed = np.asarray(Abf.apply(x), np.float64)
    rel = np.abs(mixed - exact).max() / (np.abs(exact).max() + 1)
    print(f"bf16-storage SpMV relative error: {rel:.2e} "
          f"(storage halved, arithmetic f32)")
    assert rel < 1e-2
    return {"relative_error": float(rel), "relative_error_bound": 1e-2}


if __name__ == "__main__":
    main()
