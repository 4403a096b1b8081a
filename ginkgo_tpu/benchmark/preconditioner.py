"""Preconditioner benchmark (``benchmark/preconditioner`` analog):
generate + apply times per preconditioner."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .runner import (base_parser, build_matrix_data, case_name,
                     chain_k_for_backend, emit, load_cases, time_blocking,
                     time_chained)


def _factory(name):
    from ..preconditioner.jacobi import Jacobi
    from ..preconditioner.ilu import Ic, Ilu
    from ..preconditioner.isai import Isai
    from ..preconditioner.sor import GaussSeidel, Sor
    table = {
        "jacobi": lambda: Jacobi(),
        "block-jacobi": lambda: Jacobi(max_block_size=8),
        "adaptive-block-jacobi": lambda: Jacobi(max_block_size=8,
                                                storage_dtype=jnp.bfloat16),
        "ilu": lambda: Ilu(), "ic": lambda: Ic(),
        "parilu": None,  # filled below to avoid import cycle cost
        "isai": lambda: Isai(mode="general"),
        "isai-spd": lambda: Isai(mode="spd"),
        "sor": lambda: Sor(), "gs": lambda: GaussSeidel(),
    }
    if name == "parilu":
        from ..factorization.par_ilu import ParIlu
        from ..preconditioner.ilu import Ilu as _Ilu
        return lambda: _Ilu(factorization=ParIlu(iterations=5))
    if name == "parilut":
        from ..factorization.par_ilut import ParIlut
        from ..preconditioner.ilu import Ilu as _Ilu
        return lambda: _Ilu(factorization=ParIlut(iterations=5))
    if name == "parict":
        from ..factorization.par_ilut import ParIct
        from ..preconditioner.ilu import Ic as _Ic
        return lambda: _Ic(factorization=ParIct(iterations=5))
    return table[name]


def run_case(case, preconds, args):
    from .. import Csr
    data = build_matrix_data(case)
    n = data.shape[0]
    A = Csr.from_data(data, dtype=np.float32)
    b = jnp.ones((n, 1), jnp.float32)
    k1, k2 = chain_k_for_backend()
    result = {"problem": {"name": case_name(case), "rows": n,
                          "nonzeros": data.canonical().nnz},
              "preconditioner": {}}
    for name in preconds:
        entry = {"completed": False}
        try:
            make = _factory(name)
            # reference protocol (BASELINE.md): >=1 warmup run, so the
            # recorded generate time is warm (XLA compile excluded)
            t_gen = time_blocking(lambda: make().generate(A),
                                  warmup=args.warmup,
                                  reps=max(args.repetitions // 2, 1))
            # stage split (device compute vs host<->device transfer vs
            # host symbolics): the single-chip tunnel here moves arrays
            # at ~10-16 MB/s, an environment artifact that would
            # otherwise drown the device algorithm time — analog of the
            # reference's per-stage components objects
            # (benchmark/solver/solver_common.hpp:481-484)
            from ..utils import stagetimer
            with stagetimer.collect() as st:
                t0 = time.perf_counter()
                M = make().generate(A)
                t_split = time.perf_counter() - t0
            gen_entry = {"time": t_gen}
            if st.stages:
                dev = st.stages.get("device", 0.0)
                tra = st.stages.get("transfer", 0.0)
                gen_entry.update(
                    device_time=dev, transfer_time=tra,
                    host_time=max(t_split - dev - tra, 0.0),
                    note="transfer_time is environment transport (this "
                         "harness: single-chip tunnel at ~10-16 MB/s); "
                         "device_time is the algorithm cost")
            nrm = float(jnp.abs(M._apply(b)).max())
            scale = 1.0 / max(nrm, 1.0)

            def mk(K, M=M):
                @jax.jit
                def f(M, z):
                    return jax.lax.fori_loop(
                        0, K, lambda _, z: M._apply(z) * scale, z).sum()
                return f

            t_apply = time_chained(mk, (M, b), k1, k2)
            entry.update(generate=gen_entry,
                         apply={"time": t_apply}, completed=True)
        except Exception as e:                      # noqa: BLE001
            entry["error"] = str(e)[:200]
        result["preconditioner"][name] = entry
    return result


def main(argv=None):
    p = base_parser("ginkgo_tpu preconditioner benchmark")
    p.add_argument("-preconditioners", type=str,
                   default="jacobi,block-jacobi")
    args = p.parse_args(argv)
    pcs = [s.strip() for s in args.preconditioners.split(",") if s.strip()]
    results = [run_case(c, pcs, args) for c in load_cases(args)]
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
