"""Sparse BLAS benchmark (``benchmark/sparse_blas`` analog): spgemm,
spgeam, transpose — generate-time host+device operations, wall-timed."""

from __future__ import annotations

from .runner import (base_parser, build_matrix_data, case_name, emit,
                     load_cases, time_blocking)

OPS = ("spgemm", "spgemm_device", "spgeam", "transpose")


def run_case(case, ops, args):
    from .. import Csr
    data = build_matrix_data(case)
    A = Csr.from_data(data)
    result = {"problem": {"name": case_name(case), "rows": data.shape[0],
                          "nonzeros": data.canonical().nnz},
              "sparse_blas": {}}
    for op in ops:
        entry = {"completed": False}
        try:
            if op == "spgemm":
                t = time_blocking(lambda: A.spgemm(A), warmup=args.warmup,
                                  reps=args.repetitions)
            elif op == "spgemm_device":
                from ..ops.spgemm import spgemm_data
                d = A.to_matrix_data()
                t = time_blocking(
                    lambda: spgemm_data(d, d, numeric="device"),
                    warmup=args.warmup, reps=args.repetitions)
            elif op == "spgeam":
                t = time_blocking(lambda: A.spgeam(1.0, 2.0, A),
                                  warmup=args.warmup, reps=args.repetitions)
            elif op == "transpose":
                t = time_blocking(lambda: A.transpose().values,
                                  warmup=args.warmup, reps=args.repetitions)
            else:
                raise ValueError(op)
            entry.update(time=t, completed=True)
        except Exception as e:                      # noqa: BLE001
            entry["error"] = str(e)[:200]
        result["sparse_blas"][op] = entry
    return result


def main(argv=None):
    p = base_parser("ginkgo_tpu sparse_blas benchmark")
    p.add_argument("-operations", type=str, default=",".join(OPS))
    args = p.parse_args(argv)
    ops = [o.strip() for o in args.operations.split(",") if o.strip()]
    results = [run_case(c, ops, args) for c in load_cases(args)]
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
