"""Matrix statistics (``benchmark/matrix_statistics`` analog): row-length
distribution moments + bandwidth, emitted as JSON."""

from __future__ import annotations

import numpy as np

from .runner import base_parser, build_matrix_data, case_name, emit, \
    load_cases


def run_case(case, args):
    data = build_matrix_data(case).canonical()
    n = data.shape[0]
    lengths = np.bincount(data.row_idx, minlength=n)
    bw = (np.abs(data.row_idx.astype(np.int64) - data.col_idx).max()
          if data.nnz else 0)
    q = np.percentile(lengths, [0, 25, 50, 75, 100])
    return {
        "problem": {"name": case_name(case), "rows": n,
                    "columns": data.shape[1], "nonzeros": data.nnz},
        "row_distribution": {
            "min": int(q[0]), "q1": float(q[1]), "median": float(q[2]),
            "q3": float(q[3]), "max": int(q[4]),
            "mean": float(lengths.mean()),
            "variance": float(lengths.var()),
        },
        "bandwidth": int(bw),
    }


def main(argv=None):
    p = base_parser("ginkgo_tpu matrix statistics")
    args = p.parse_args(argv)
    results = [run_case(c, args) for c in load_cases(args)]
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
