"""Sweep (S, unroll) of the block-partitioned exact trisolve on chip."""

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
    from ginkgo_tpu.benchmark.runner import chain_k_for_backend, time_chained
    from ginkgo_tpu.factorization.par_ilu import Ic0
    from ginkgo_tpu.ops.tri_banded import (block_trisolve_apply,
                                           plan_block_trisolve)
    from ginkgo_tpu.utils.generators import stencil_3d

    data = stencil_3d(64, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    b = jnp.ones((n, 1), jnp.float32)
    fact = Ic0().generate(A)
    ld = fact.l_factor.to_matrix_data()
    k1, k2 = chain_k_for_backend()
    for S in (64, 128, 256, 512):
        for U in (4, 8, 16):
            t0 = time.time()
            out = plan_block_trisolve(ld, True, False, S=S, unroll=U)
            gen = time.time() - t0
            if out is None:
                print(f"S={S} U={U}: rejected", flush=True)
                continue
            arrays, meta = out
            inv = jnp.asarray(arrays["inv"])
            ov = jnp.asarray(arrays["ov"])
            mi = tuple(sorted(meta.items()))

            def mk(K):
                @jax.jit
                def f(inv, ov, z):
                    def body(_, z):
                        return block_trisolve_apply(inv, ov, mi, z) / K
                    return jax.lax.fori_loop(0, K, body, z).sum()
                return f

            t = time_chained(mk, (inv, ov, b), k1, k2)
            print(f"S={S:4d} U={U:2d}: gen {gen:5.1f}s  "
                  f"{t*1e3:7.3f} ms/apply  "
                  f"traffic {n*S*4/819e9*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
