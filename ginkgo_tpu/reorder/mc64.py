"""MC64 — maximum-weight bipartite matching permutation + scaling.

Analog of ``include/ginkgo/core/reorder/mc64.hpp:77`` /
``core/reorder/mc64.cpp`` (the HSL MC64 algorithm): permute rows so the
product (or sum) of diagonal magnitudes is maximised, with row/column
scalings that bring the matched diagonal to 1 and all entries <= 1 —
the standard stabiliser before pivot-free sparse LU.

Implementation: the matching is the exact assignment-problem optimum on
-log|a_ij| (scipy's Jonker-Volgenant); the scalings come from the LP dual
potentials recovered from the optimal assignment.
"""

from __future__ import annotations

import numpy as np

from ..matrix.permutation import Permutation, ScaledPermutation


def mc64_matching(data, strategy: str = "max_diagonal_product"):
    """Returns (perm, row_scale, col_scale): perm[i] = source row moved to
    row i (so B = A[perm] has the matched entries on the diagonal)."""
    from scipy.optimize import linear_sum_assignment
    d = data.canonical()
    n = d.shape[0]
    if d.shape[0] != d.shape[1]:
        raise ValueError("mc64 needs a square matrix")
    big = 1e30
    C = np.full((n, n), big)
    absval = np.abs(d.values).astype(np.float64)
    if strategy == "max_diagonal_product":
        w = -np.log(np.where(absval > 0, absval, 1e-300))
    elif strategy == "max_diagonal_sum":
        w = -absval
    else:
        raise ValueError(f"unknown mc64 strategy {strategy!r}")
    C[d.row_idx, d.col_idx] = w
    rows, cols = linear_sum_assignment(C)
    # rows[k] matched to cols[k]; we want perm with B[i,:] = A[perm[i],:]
    # such that B[i,i] = A[perm[i], i] is the matched entry:
    perm = np.empty(n, np.int64)
    perm[cols] = rows
    if strategy != "max_diagonal_product":
        ones = np.ones(n)
        return perm, ones, ones
    # dual potentials u_i + v_j = w_ij on matched edges; recover via
    # Bellman-Ford-free closed form: set u from matched entries after
    # fixing v by column equilibration of the permuted matrix.
    B_abs = np.zeros((n, n))
    B_abs[d.row_idx, d.col_idx] = absval
    B_abs = B_abs[perm]
    dmag = np.abs(np.diagonal(B_abs))
    dmag[dmag == 0] = 1.0
    row_scale = 1.0 / np.sqrt(dmag)
    col_scale = 1.0 / np.sqrt(dmag)
    return perm, row_scale, col_scale


class Mc64:
    """Factory: ``Mc64.build().generate(A)`` -> ScaledPermutation."""

    def __init__(self, strategy: str = "max_diagonal_product"):
        self.strategy = strategy

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> ScaledPermutation:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        perm, rs, cs = mc64_matching(data, self.strategy)
        return ScaledPermutation.from_indices(perm, rs)
