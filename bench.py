"""Headline benchmark: SpMV throughput on the 27-pt Poisson stencil.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Protocol follows Ginkgo's benchmark suite (BENCHMARKING.md:52-57 — warmup +
averaged repetitions; storage-bytes accounting per
``benchmark/utils/loggers.hpp:111``).

Timing method: this environment dispatches through a tunnel with ~25ms
per-call overhead, so kernel time is extracted by *differencing* two chain
depths run inside single jit calls: t_iter = (t(K2) - t(K1)) / (K2 - K1).
That measures steady-state device throughput, which is what Ginkgo's
device-side repetition timing measures.  The STREAM bound is measured
in-situ the same way, and ``vs_baseline`` = achieved GB/s / (0.8 * STREAM)
per BASELINE.md's north star, so >= 1.0 meets the per-chip target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_call(f, args, reps=3):
    float(f(*args))  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _net_iter_time(make_chain, args, k1, k2, samples=3):
    # Median of independent difference measurements: one tunnel-tail-latency
    # hit on
    # a k1 batch inflates (t2-t1)⁻¹ past speed of light (observed: a
    # STREAM "1020 GB/s" sample on 819 GB/s HBM); the median discards it.
    f1, f2 = make_chain(k1), make_chain(k2)
    ts = []
    for _ in range(samples):
        t1 = _time_call(f1, args)
        t2 = _time_call(f2, args)
        ts.append(max((t2 - t1) / (k2 - k1), 1e-9))
    return sorted(ts)[len(ts) // 2]


def measure_stream_gbps(on_tpu):
    n = (64 if on_tpu else 4) * 1024 * 1024
    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 0.5, jnp.float32)

    def make_chain(K):
        @jax.jit
        def triad(a, b):
            # z_{k+1} = a * s + z_k reads a and z, writes z: 3n accesses
            def body(_, z):
                return a * 1.0000001 + z * 0.9999999
            return jax.lax.fori_loop(0, K, body, b).sum()
        return triad

    t = _net_iter_time(make_chain, (a, b), 8, 40)
    return 3 * n * 4 / t / 1e9


def measure_spmv(on_tpu):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.utils.generators import stencil_3d

    nx = 160 if on_tpu else 48
    data = stencil_3d(nx, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    x = jnp.ones((n, 1), jnp.float32)
    scale = 1.0 / 27.0

    def make_chain(K):
        @jax.jit
        def chain(A, z):
            return jax.lax.fori_loop(
                0, K, lambda _, z: A._apply(z) * scale, z).sum()
        return chain

    k1, k2 = (8, 64) if on_tpu else (2, 8)
    t = _net_iter_time(make_chain, (A, x), k1, k2)
    vbytes = 4
    if A.strategy == "banded":
        storage = A.diag_values.size * vbytes     # no index storage
        if A.tail_vals is not None:
            storage += A.tail_vals.size * (vbytes + 8)
    else:
        # values + col indices + row pointers (loggers.hpp:111 accounting)
        storage = A.nnz * (vbytes + 4) + (n + 1) * 4
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
