"""Distributed SpMV / solver benchmark with weak-scaling efficiency.

Analog of ``benchmark/spmv/distributed`` + ``benchmark/solver/distributed``:
runs the row-sharded SpMV on 1..P devices of the mesh with the problem size
scaled proportionally (weak scaling) and reports per-configuration nnz/s
plus efficiency vs the 1-device baseline — BASELINE.md's second north star
(>= 75% nnz/s weak-scaling efficiency).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .runner import base_parser, chain_k_for_backend, emit, time_chained


def _device_pool(want: int):
    """Devices for the mesh; like __graft_entry__.dryrun_multichip, fall
    back to the CPU backend's virtual devices
    (--xla_force_host_platform_device_count) when the default platform —
    possibly pinned to one real TPU by the environment — is too small."""
    devs = jax.devices()
    if len(devs) < want:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) > len(devs):
                devs = cpu
        except RuntimeError:
            pass
    return devs


def run_weak_scaling(base_edge: int, parts_list, comm, args):
    from ..distributed import (Partition, distribute_vector,
                               read_distributed)
    from ..utils.generators import stencil_3d
    results = []
    base_nnz_per_s = None
    pool = _device_pool(max(parts_list))
    # chain depths must match the pool that actually runs (the fallback
    # may pick CPU virtual devices while the default backend is the TPU)
    k1, k2 = chain_k_for_backend(pool[0].platform)
    if pool[0].platform == "cpu":
        # the kernel tier follows the DEFAULT backend; a CPU device pool
        # under a TPU default would trace Pallas kernels into a CPU
        # shard_map — pin the reference tier to the pool instead
        from ..ops.registry import use_tier
        ctx = use_tier("reference")
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        return _run_weak_scaling_inner(base_edge, parts_list, comm, args,
                                       pool, k1, k2)


def _run_weak_scaling_inner(base_edge, parts_list, comm, args, pool,
                            k1, k2):
    from ..distributed import (Partition, distribute_vector,
                               read_distributed)
    from ..utils.generators import stencil_3d
    results = []
    base_nnz_per_s = None
    for P in parts_list:
        if P > len(pool):
            results.append({"devices": P, "skipped": "not enough devices"})
            continue
        # weak scaling: rows grow with P (z-extent scales)
        data = stencil_3d(base_edge, base_edge, base_edge * P, points=27)
        n = data.shape[0]
        nnz = data.canonical().nnz
        part = Partition.build_from_global_size_uniform(P, n)
        mesh = Mesh(np.array(pool[:P]), ("rows",))
        A = read_distributed(data, part, mesh, comm=comm)
        x = distribute_vector(np.ones((n, 1), np.float32), part, mesh)
        nrm = float(jnp.abs(A._apply(x)).max())
        scale = 1.0 / max(nrm, 1.0)

        def mk(K, A=A):
            @jax.jit
            def chain(A, z):
                return jax.lax.fori_loop(
                    0, K, lambda _, z: A._apply(z) * scale, z).sum()
            return chain

        t = time_chained(mk, (A, x), k1, k2,
                         reps=max(args.repetitions // 2, 2))
        nnz_per_s = nnz / t
        entry = {"devices": P, "rows": n, "nonzeros": nnz,
                 "time": t, "nnz_per_s": nnz_per_s, "comm": comm,
                 "device_pool": pool[0].platform}
        if P == 1:
            base_nnz_per_s = nnz_per_s      # the documented 1-device base
        if base_nnz_per_s is not None:
            entry["weak_scaling_efficiency"] = (
                nnz_per_s / (P * base_nnz_per_s))
        results.append(entry)
    return results


def main(argv=None):
    p = base_parser("ginkgo_tpu distributed weak-scaling benchmark")
    p.add_argument("-base_edge", type=int, default=24)
    p.add_argument("-devices", type=str, default="1,2,4,8")
    p.add_argument("-comm", type=str, default="dense")
    args = p.parse_args(argv)
    parts = [int(s) for s in args.devices.split(",")]
    results = run_weak_scaling(args.base_edge, parts, args.comm, args)
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
