"""Matrix generator benchmark executable.

Analog of ``benchmark/matrix_generator/matrix_generator.cpp``: reads a JSON
array of matrix configurations and writes each generated matrix to its
``filename`` in MatrixMarket format.  Schema (same as the reference):

    [{"filename": "<out.mtx>",
      "problem": {"type": "block-diagonal",
                  "num_blocks": N, "block_size": B}}]

"block-diagonal" repeats a dense BxB block of uniform[-1, 1] values
``num_blocks`` times on the diagonal.  Extra types beyond the reference:
"stencil" ({"stencil": "5pt|9pt|7pt|27pt", "size": edge}) and "random"
({"rows", "cols", "nonzeros_per_row"}).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _generate(problem, rng):
    from ..base.matrix_data import MatrixData
    kind = problem.get("type", "block-diagonal")
    if kind == "block-diagonal":
        nb = int(problem.get("num_blocks", 1))
        bs = int(problem.get("block_size", 1))
        n = nb * bs
        blocks = rng.uniform(-1.0, 1.0, (nb, bs, bs))
        base = np.arange(nb)[:, None, None] * bs
        rows = np.broadcast_to(
            base + np.arange(bs)[None, :, None], (nb, bs, bs)).ravel()
        cols = np.broadcast_to(
            base + np.arange(bs)[None, None, :], (nb, bs, bs)).ravel()
        return MatrixData((n, n), rows, cols, blocks.ravel())
    if kind == "stencil":
        from ..utils.generators import stencil_2d, stencil_3d
        st = problem.get("stencil", "27pt")
        size = int(problem.get("size", 32))
        if st in ("5pt", "9pt"):
            return stencil_2d(size, points=int(st[0]))
        return stencil_3d(size, points=int(st[:-2]))
    if kind == "random":
        from ..utils.generators import generate_random_matrix
        # per-problem seed wins; else derive from the CLI -seed stream
        seed = int(problem.get("seed", rng.integers(2**31 - 1)))
        return generate_random_matrix(
            int(problem.get("rows", 100)), int(problem.get("cols", 100)),
            nonzeros_per_row=tuple(problem.get("nonzeros_per_row", (1, 5))),
            seed=seed)
    raise ValueError(f"unknown matrix type {kind!r}; supported: "
                     "block-diagonal, stencil, random")


def main(argv=None):
    p = argparse.ArgumentParser(description="ginkgo_tpu matrix generator")
    p.add_argument("-input", type=str, required=True,
                   help="JSON configurations (file path or literal JSON)")
    p.add_argument("-seed", type=int, default=42)
    args = p.parse_args(argv)
    s = args.input
    try:
        cases = json.loads(s)
    except json.JSONDecodeError:
        with open(s) as f:
            cases = json.load(f)
    if not isinstance(cases, list):
        raise ValueError("input must be a JSON array of configurations")
    from ..base.mtx_io import write_mtx
    rng = np.random.default_rng(args.seed)
    out = []
    for case in cases:
        if "filename" not in case:
            raise ValueError(f"configuration missing 'filename': {case!r}")
        data = _generate(case.get("problem", {}), rng)
        write_mtx(case["filename"], data)
        out.append({"filename": case["filename"],
                    "problem": dict(case.get("problem", {}),
                                    rows=data.shape[0], cols=data.shape[1],
                                    nonzeros=int(data.nnz))})
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
