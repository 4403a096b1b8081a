"""SpMV benchmark — per-format apply throughput.

Analog of ``benchmark/spmv/spmv_common.hpp:174-198``: JSON out carries
``time`` (seconds/apply), ``storage`` (bytes, per
``benchmark/utils/loggers.hpp:111`` accounting), ``completed``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .runner import (base_parser, build_matrix_data, case_name,
                     chain_k_for_backend, emit, load_cases, time_chained)

ALL_FORMATS = ("coo", "csr", "ell", "sellp", "hybrid", "fbcsr",
               "csr_banded", "csr_packed")


def make_operator(fmt: str, data, dtype=np.float32):
    from .. import Coo, Csr, Ell, Fbcsr, Hybrid, Sellp
    if fmt == "coo":
        return Coo.from_data(data, dtype=dtype)
    if fmt == "csr":
        return Csr.from_data(data, dtype=dtype, strategy="classical")
    if fmt == "csr_banded":
        return Csr.from_data(data, dtype=dtype, strategy="automatical")
    if fmt == "csr_packed":
        return Csr.from_data(data, dtype=dtype, strategy="packed")
    if fmt == "ell":
        return Ell.from_data(data, dtype=dtype)
    if fmt == "sellp":
        return Sellp.from_data(data, dtype=dtype)
    if fmt == "hybrid":
        return Hybrid.from_data(data, dtype=dtype)
    if fmt == "fbcsr":
        return Fbcsr.from_data(data, dtype=dtype)
    raise ValueError(f"unknown format {fmt!r}")


def storage_bytes(fmt, A):
    vb = np.dtype(np.float32).itemsize
    ib = 4
    fast = getattr(A, "fast_op", None)
    if fast is not None:
        # the format delegates its apply to the shared banded/packed
        # plan (matrix/fastpath.py): the streamed bytes are the plan's
        tail = (0 if fast.tail_vals is None
                else int(fast.tail_vals.size * (vb + 2 * ib)))
        if fast.strategy == "banded":
            return int(fast.diag_values.size * vb) + tail
        return int(fast.pell_vals.size * (vb + 2)) + tail
    if fmt == "csr_banded":
        if getattr(A, "strategy", "") == "banded":
            tail = (0 if A.tail_vals is None
                    else int(A.tail_vals.size * (vb + 2 * ib)))
            return int(A.diag_values.size * vb) + tail
        fmt = "csr"   # automatical fell back to the classical layout
    if fmt == "csr_packed":
        if getattr(A, "strategy", "") == "packed":
            tail = (0 if A.tail_vals is None
                    else int(A.tail_vals.size * (vb + 2 * ib)))
            return int(A.pell_vals.size * (vb + 2)) + tail
        fmt = "csr"   # packed layout rejected the matrix
    if fmt == "coo" or fmt == "csr":
        return int(A.nnz * (vb + ib)) + (
            (A.shape[0] + 1) * ib if fmt == "csr" else A.nnz * ib)
    if fmt == "ell":
        return int(A.values.size * (vb + ib))
    if fmt == "sellp":
        return int(A.val_flat.size * (vb + ib))
    if fmt == "hybrid":
        return int(A.ell.values.size * (vb + ib)
                   + A.coo.nnz * (2 * ib + vb))
    if fmt == "fbcsr":
        return int(A.blocks.size * vb + 2 * A.nnzb * ib)
    return 0


def run_case(case, formats, args):
    data = build_matrix_data(case)
    n = data.shape[0]
    result = {"problem": {"name": case_name(case), "rows": n,
                          "cols": data.shape[1],
                          "nonzeros": data.canonical().nnz},
              "spmv": {}}
    x = jnp.ones((n, 1), jnp.float32)
    k1, k2 = chain_k_for_backend()
    for fmt in formats:
        entry = {"completed": False}
        try:
            A = make_operator(fmt, data)
            nrm = float(jnp.abs(A._apply(x)).max())
            scale = 1.0 / max(nrm, 1.0)

            def make_chain(K, A=A):
                @jax.jit
                def chain(A, z):
                    return jax.lax.fori_loop(
                        0, K, lambda _, z: A._apply(z) * scale, z).sum()
                return chain

            t = time_chained(make_chain, (A, x), k1, k2,
                             reps=max(args.repetitions // 2, 2))
            sb = storage_bytes(fmt, A)
            entry.update(time=t, storage=sb,
                         bandwidth=(sb + 2 * n * 4) / t,
                         completed=True)
        except Exception as e:                      # noqa: BLE001
            entry["error"] = str(e)[:200]
        result["spmv"][fmt] = entry
    best = [f for f, e in result["spmv"].items() if e.get("completed")]
    if best:
        result["optimal"] = {"spmv": min(
            best, key=lambda f: result["spmv"][f]["time"])}
    return result


def main(argv=None):
    p = base_parser("ginkgo_tpu spmv benchmark")
    p.add_argument("-formats", type=str, default="csr,csr_banded,ell")
    args = p.parse_args(argv)
    formats = [f.strip() for f in args.formats.split(",") if f.strip()]
    results = [run_case(c, formats, args) for c in load_cases(args)]
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
