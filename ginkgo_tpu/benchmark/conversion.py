"""Format-conversion benchmark (``benchmark/conversion`` analog)."""

from __future__ import annotations

from .runner import (base_parser, build_matrix_data, case_name, emit,
                     load_cases, time_blocking)
from .spmv import ALL_FORMATS, make_operator


def run_case(case, conversions, args):
    data = build_matrix_data(case)
    result = {"problem": {"name": case_name(case), "rows": data.shape[0],
                          "nonzeros": data.canonical().nnz},
              "conversion": {}}
    for conv in conversions:
        src, dst = conv.split("-")
        entry = {"completed": False}
        try:
            t = time_blocking(lambda: make_operator(dst, data),
                              warmup=args.warmup, reps=args.repetitions) \
                if src == "data" else None
            if t is None:
                A = make_operator(src, data)
                t = time_blocking(
                    lambda: make_operator(dst, A.to_matrix_data()),
                    warmup=args.warmup, reps=args.repetitions)
            entry.update(time=t, completed=True)
        except Exception as e:                      # noqa: BLE001
            entry["error"] = str(e)[:200]
        result["conversion"][conv] = entry
    return result


def main(argv=None):
    p = base_parser("ginkgo_tpu conversion benchmark")
    p.add_argument("-conversions", type=str,
                   default="data-csr,data-ell,csr-ell,csr-hybrid")
    args = p.parse_args(argv)
    convs = [c.strip() for c in args.conversions.split(",") if c.strip()]
    results = [run_case(c, convs, args) for c in load_cases(args)]
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
