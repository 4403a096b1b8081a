"""ginkgo-ranges example: the accessor machinery — storage at reduced
precision, arithmetic at full precision (accessor/ templates analog)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu.base.accessor import ReducedRowMajor, ScaledReducedRowMajor


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)

    r = ReducedRowMajor.from_array(data, jnp.bfloat16)
    err = float(jnp.abs(r.read() - data).max())
    print(f"bf16 storage, f32 reads: max err {err:.2e} "
          f"(storage {r.storage.nbytes}B vs {data.nbytes}B)")
    assert err < 0.02 and r.storage.nbytes == data.nbytes // 2

    s = ScaledReducedRowMajor.create((8, 128), jnp.int16, jnp.float32)
    for i in range(8):
        s = s.write(i, data[i])
    err = float(jnp.abs(s.read() - data).max())
    print(f"scaled int16 storage: max err {err:.2e}")
    assert err < 1e-3
    return {"scaled_error": err, "scaled_error_bound": 1e-3}


if __name__ == "__main__":
    main()
