"""Run every benchmark suite (``benchmark/run_all_benchmarks.sh`` analog).

``python -m ginkgo_tpu.benchmark.run_all [-outdir DIR] [-size N]``
writes one JSON file per suite.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="run all benchmark suites")
    p.add_argument("-outdir", type=str, default="benchmark_results")
    p.add_argument("-size", type=int, default=32)
    p.add_argument("-suites", type=str,
                   default="spmv,solver,preconditioner,blas,sparse_blas,"
                           "conversion,matrix_statistics")
    args = p.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    case = json.dumps([{"stencil": "27pt", "size": args.size}])
    import importlib
    for suite in args.suites.split(","):
        suite = suite.strip()
        mod = importlib.import_module(f"ginkgo_tpu.benchmark.{suite}")
        out = os.path.join(args.outdir, f"{suite}.json")
        argv_s = ["-input", case, "-output", out]
        if suite == "blas":
            argv_s = ["-output", out]
        try:
            mod.main(argv_s)
            sys.stderr.write(f"[run_all] {suite} -> {out}\n")
        except Exception as e:                      # noqa: BLE001
            sys.stderr.write(f"[run_all] {suite} FAILED: {e}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
