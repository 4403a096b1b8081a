"""A/B the banded block-inverse build: host trtri + ship vs the
device-scattered MXU doubling inverse (ops/tri_banded._want_device_inverse
path).  Run on the real chip: python tools/probe_tri_inv_device.py [edge].

Measures, for the 27-pt IC(0) lower factor at n=edge^3:
  host:   plan_block_trisolve(device_build=False) + jnp.asarray(inv)
          (what generate() paid before: LAPACK trtri loop + (nb, S, S)
          transfer through the host link)
  device: plan_block_trisolve(device_build=True) cold (compile+transfer)
          and warm (second factor, same shapes: executable cached)
and checks the two inverses agree on a sample.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp
import numpy as np


def main(edge=64):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.factorization.par_ilu import Ic0
    from ginkgo_tpu.ops.tri_banded import plan_block_trisolve
    from ginkgo_tpu.utils.generators import stencil_3d

    data = stencil_3d(edge, points=27)
    n = data.shape[0]
    A = Csr.from_data(data, dtype=np.float32)
    f = Ic0().generate(A)
    ld = f.l_factor.to_matrix_data()
    print(f"n={n} factor nnz={ld.nnz}")

    t0 = time.perf_counter()
    host = plan_block_trisolve(ld, True, False, device_build=False)
    inv_h = jnp.asarray(host[0]["inv"])
    inv_h.block_until_ready()
    t_host = time.perf_counter() - t0
    print(f"host build+ship: {t_host:.2f} s")

    t0 = time.perf_counter()
    dev = plan_block_trisolve(ld, True, False, device_build=True)
    dev[0]["inv"].block_until_ready()
    t_cold = time.perf_counter() - t0
    print(f"device build cold (compile+transfer): {t_cold:.2f} s")

    # same-shape second factor (new values): warm executable
    ld2 = type(ld)(ld.shape, ld.row_idx, ld.col_idx,
                   (ld.values * 1.01).astype(ld.values.dtype))
    t0 = time.perf_counter()
    dev2 = plan_block_trisolve(ld2, True, False, device_build=True)
    dev2[0]["inv"].block_until_ready()
    t_warm = time.perf_counter() - t0
    print(f"device build warm: {t_warm:.2f} s  "
          f"(host/warm = {t_host / t_warm:.1f}x)")

    err = float(jnp.abs(dev[0]["inv"] - inv_h).max() /
                jnp.abs(inv_h).max())
    print(f"max rel disagreement vs host f64 build: {err:.2e}")
    assert err < 5e-5, err


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
