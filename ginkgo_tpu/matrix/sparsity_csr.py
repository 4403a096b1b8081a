"""SparsityCsr — pattern-only matrix.

Analog of ``include/ginkgo/core/matrix/sparsity_csr.hpp:51``: stores only the
sparsity pattern plus one shared scalar value (default 1); used for symbolic
work (power patterns for ISAI, graph algorithms) and cheap pattern SpMV.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..ops.registry import lookup


@linop_dataclass
class SparsityCsr(LinOp):
    row_idx: jnp.ndarray   # (nnz_stored,) padded with n
    col_idx: jnp.ndarray   # (nnz_stored,) padded with 0
    value: jnp.ndarray     # () shared scalar
    shape: tuple = static_field()
    nnz: int = static_field()

    def _apply(self, b):
        ones = jnp.where(self.row_idx < self.shape[0],
                         jnp.ones_like(self.row_idx, b.dtype),
                         jnp.zeros((), b.dtype))
        y = lookup("coo_spmv")(self.row_idx, self.col_idx, ones, b,
                               self.shape[0])
        return self.value.astype(b.dtype) * y

    @classmethod
    def from_data(cls, data: MatrixData, value=1.0, index_dtype=jnp.int32,
                  pad_multiple: int = 8):
        from .coo import pad_nnz
        d = data.canonical()
        nnz = d.nnz
        cap = pad_nnz(nnz, pad_multiple)
        rows = np.full(cap, d.shape[0], np.int64)
        cols = np.zeros(cap, np.int64)
        rows[:nnz] = d.row_idx
        cols[:nnz] = d.col_idx
        return cls(row_idx=jnp.asarray(rows, index_dtype),
                   col_idx=jnp.asarray(cols, index_dtype),
                   value=jnp.asarray(value), shape=d.shape, nnz=nnz)

    @classmethod
    def from_pattern_of(cls, op, value=1.0):
        return cls.from_data(op.to_matrix_data(), value=value)

    def to_dense(self):
        vals = jnp.full(self.row_idx.shape, self.value)
        return jnp.zeros(self.shape, vals.dtype).at[
            self.row_idx, self.col_idx].add(vals, mode="drop")

    def to_matrix_data(self) -> MatrixData:
        nnz = self.nnz
        v = float(np.asarray(self.value))
        return MatrixData(self.shape, np.asarray(self.row_idx)[:nnz],
                          np.asarray(self.col_idx)[:nnz],
                          np.full(nnz, v))

    def to_adjacency(self):
        """(rows, cols) numpy pattern for host graph algorithms."""
        return (np.asarray(self.row_idx)[:self.nnz],
                np.asarray(self.col_idx)[:self.nnz])
