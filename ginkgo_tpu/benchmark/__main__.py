"""CLI dispatcher: ``python -m ginkgo_tpu.benchmark <suite> [flags]``.

Suites mirror Ginkgo's benchmark executables (SURVEY.md Appendix C):
spmv, solver, preconditioner, blas, sparse_blas, conversion,
matrix_statistics.
"""

import sys

SUITES = ("spmv", "solver", "preconditioner", "blas", "sparse_blas",
          "conversion", "matrix_statistics", "distributed",
          "matrix_generator")


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in SUITES:
        sys.stderr.write(
            f"usage: python -m ginkgo_tpu.benchmark <{'|'.join(SUITES)}> "
            "[flags]\n")
        return 2
    suite = sys.argv[1]
    import importlib
    mod = importlib.import_module(f".{suite}", __package__)
    mod.main(sys.argv[2:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
