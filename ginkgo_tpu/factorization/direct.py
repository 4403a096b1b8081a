"""Sparse direct factorizations with fill-in: LU and Cholesky.

Analog of ``include/ginkgo/core/factorization/lu.hpp:54`` /
``cholesky.hpp:35`` (``core/factorization/{lu,cholesky}.cpp``,
``elimination_forest.cpp``, ``symbolic.cpp``).

Symbolic + numeric both run at generate time on the host (like Ginkgo's
symbolic phase; factorization is a setup-cost activity), producing static
L/U Csr factors whose *solves* run on device via the level-scheduled
triangular kernels.  The numeric kernel is an IKJ row elimination over
dict-of-rows with on-the-fly fill — O(flops of the factorization).
"""

from __future__ import annotations

import numpy as np

from ..base.matrix_data import MatrixData
from ..matrix.csr import Csr
from .container import Factorization


def _rows_dict(d: MatrixData):
    rows = [dict() for _ in range(d.shape[0])]
    for i, j, v in zip(d.row_idx, d.col_idx, d.values):
        rows[int(i)][int(j)] = rows[int(i)].get(int(j), 0) + v
    return rows


def _collect(rows, pred):
    r, c, v = [], [], []
    for i, row in enumerate(rows):
        for j, val in row.items():
            if pred(i, j) and val != 0:
                r.append(i)
                c.append(j)
                v.append(val)
    return (np.asarray(r, np.int64), np.asarray(c, np.int64), v)


class Lu:
    """Sparse LU with fill (no pivoting, like Ginkgo's Lu — reorder/scale
    first via Mc64/ScaledReordered for stability)."""

    def __init__(self, symbolic_algorithm: str = "general"):
        self.symbolic_algorithm = symbolic_algorithm

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> Factorization:
        import collections
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d = data.canonical()
        n = d.shape[0]
        from ..native import lu_factor_native
        native = lu_factor_native(n, d.row_idx, d.col_idx, d.values)
        if native is not None:
            (lr, lc, lv), (ur, uc, uv) = native
            dtype = d.values.dtype
            diag = np.arange(n)
            l_data = MatrixData(
                (n, n), np.concatenate([lr, diag]),
                np.concatenate([lc, diag]),
                np.concatenate([lv.astype(dtype), np.ones(n, dtype)]))
            u_data = MatrixData((n, n), ur, uc, uv.astype(dtype))
            return Factorization(
                l_factor=Csr.from_data(l_data, strategy="classical"),
                u_factor=Csr.from_data(u_data, strategy="classical"))
        rows = _rows_dict(d)
        # column -> rows holding a (possibly fill) entry there, maintained
        # as fill appears, so elimination cost tracks actual nnz+fill
        col_rows = collections.defaultdict(set)
        for i, row in enumerate(rows):
            for j in row:
                col_rows[j].add(i)
        for k in range(n):
            dk = rows[k].get(k, 0)
            if dk == 0:
                rows[k][k] = dk = 1.0  # zero pivot guard
            urow = [(j, v) for j, v in rows[k].items() if j > k]
            for i in sorted(col_rows[k]):
                if i <= k:
                    continue
                ri = rows[i]
                aik = ri.get(k)
                if aik is None or aik == 0:
                    continue
                lik = aik / dk
                ri[k] = lik
                for j, ukj in urow:
                    if j in ri:
                        ri[j] -= lik * ukj
                    else:
                        ri[j] = -lik * ukj
                        col_rows[j].add(i)
        lr, lc, lv = _collect(rows, lambda i, j: j < i)
        ur, uc, uv = _collect(rows, lambda i, j: j >= i)
        dtype = d.values.dtype
        diag = np.arange(n)
        l_data = MatrixData((n, n), np.concatenate([lr, diag]),
                            np.concatenate([lc, diag]),
                            np.concatenate([np.asarray(lv, dtype),
                                            np.ones(n, dtype)]))
        u_data = MatrixData((n, n), ur, uc, np.asarray(uv, dtype))
        return Factorization(l_factor=Csr.from_data(l_data,
                                                    strategy="classical"),
                             u_factor=Csr.from_data(u_data,
                                                    strategy="classical"))


class Cholesky:
    """Sparse Cholesky with fill (elimination-forest symbolic folded into
    the up-looking numeric pass)."""

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> Factorization:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d = data.canonical()
        n = d.shape[0]
        from ..native import chol_factor_native
        native = chol_factor_native(n, d.row_idx, d.col_idx, d.values)
        if native is not None:
            lr, lc, lv = native
            dtype = d.values.dtype
            l_data = MatrixData((n, n), lr, lc,
                                lv.astype(dtype)).sort_row_major()
            L = Csr.from_data(l_data, strategy="classical")
            Lt = Csr.from_data(l_data.conj_transpose().sort_row_major(),
                               strategy="classical")
            return Factorization(l_factor=L, u_factor=Lt, symmetric=True)
        # work on the lower triangle, column-oriented left-looking; a
        # row->finalized-columns index keeps cost at O(nnz + fill) instead
        # of scanning all previous columns per j (the Lu col_rows trick)
        cols = [dict() for _ in range(n)]   # cols[j][i] = L[i, j], i >= j
        row_cols = [[] for _ in range(n)]   # row j -> columns k<j, L[j,k]!=0
        for i, j, v in zip(d.row_idx, d.col_idx, d.values):
            if i >= j:
                cols[int(j)][int(i)] = v
        for j in range(n):
            for k in row_cols[j]:
                ljk = cols[k].get(j)
                if ljk is None or ljk == 0:
                    continue
                for i, lik in cols[k].items():
                    if i >= j:
                        cols[j][i] = cols[j].get(i, 0) - lik * np.conj(ljk)
            djj = cols[j].get(j, 0)
            ljj = np.sqrt(abs(djj))
            if ljj == 0:
                ljj = 1.0
            cols[j][j] = ljj
            for i in list(cols[j]):
                if i > j:
                    cols[j][i] = cols[j][i] / ljj
                    row_cols[i].append(j)   # column j is now finalized
        r, c, v = [], [], []
        for j in range(n):
            for i, val in cols[j].items():
                if val != 0:
                    r.append(i)
                    c.append(j)
                    v.append(val)
        dtype = d.values.dtype
        l_data = MatrixData((n, n), np.asarray(r, np.int64),
                            np.asarray(c, np.int64), np.asarray(v, dtype))
        L = Csr.from_data(l_data, strategy="classical")
        Lt = Csr.from_data(l_data.conj_transpose().sort_row_major(),
                           strategy="classical")
        return Factorization(l_factor=L, u_factor=Lt, symmetric=True)
