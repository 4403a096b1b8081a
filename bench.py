"""Headline benchmark: SpMV throughput on the 27-pt Poisson stencil.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Protocol follows Ginkgo's benchmark suite (BENCHMARKING.md:52-57 — warmup +
averaged repetitions; storage-bytes accounting per
``benchmark/utils/loggers.hpp:111``).  The STREAM bound is measured in-situ
with a triad (this environment's per-kernel dispatch overhead makes nominal
datasheet numbers meaningless), and ``vs_baseline`` = achieved GB/s divided
by the BASELINE.md target (80% of measured STREAM), so >= 1.0 meets the
per-chip north star.  SpMV timings amortise dispatch overhead by chaining
data-dependent products inside one jitted loop.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _chain_time(f, args, K, reps=3):
    float(f(*args))  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def measure_stream_gbps(on_tpu):
    n = (64 if on_tpu else 4) * 1024 * 1024
    a = jnp.ones((n,), jnp.float32)
    K = 16

    @jax.jit
    def triad(a, z):
        return jax.lax.fori_loop(0, K, lambda _, z: a * 2.0 + z, z).sum()

    t = _chain_time(triad, (a, jnp.zeros_like(a)), K)
    return 3 * n * 4 / t / 1e9


def measure_spmv(on_tpu):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.utils.generators import stencil_3d

    nx = 160 if on_tpu else 48
    data = stencil_3d(nx, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    x = jnp.ones((n, 1), jnp.float32)
    K = 32 if on_tpu else 4
    scale = 1.0 / 27.0

    @jax.jit
    def chain(A, z):
        return jax.lax.fori_loop(
            0, K, lambda _, z: A._apply(z) * scale, z).sum()

    t = _chain_time(chain, (A, x), K)
    vbytes = 4
    if A.strategy == "banded":
        storage = A.diag_values.size * vbytes     # no index storage
    else:
        storage = A.nnz * (vbytes + 4)
    bytes_moved = storage + 2 * n * vbytes
    return A, n, bytes_moved / t / 1e9


def main():
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    stream = measure_stream_gbps(on_tpu)
    A, n, gbps = measure_spmv(on_tpu)
    target = 0.8 * stream
    print(json.dumps({
        "metric": f"spmv_27pt_poisson_n{n}_{A.strategy}_{backend}"
                  f"_stream{stream:.0f}",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 4),
    }))


if __name__ == "__main__":
    main()
