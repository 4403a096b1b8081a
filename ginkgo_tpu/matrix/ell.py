"""ELL format (``include/ginkgo/core/matrix/ell.hpp:52``).

Fixed nnz-per-row padded layout — on TPU the (n, width) value/col planes map
directly onto VPU lanes, with padded slots carrying col=0/val=0 so no mask is
needed on the multiply path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..ops.registry import lookup


@linop_dataclass
class Ell(LinOp):
    col_idx: jnp.ndarray      # (n, width) int, padded with 0
    values: jnp.ndarray       # (n, width), padded with 0
    row_lengths: jnp.ndarray  # (n,) int
    shape: tuple = static_field()
    nnz: int = static_field()
    fast_op: object = None    # SpmvPlan TPU fast path (matrix/fastpath.py)

    @property
    def width(self):
        return self.values.shape[1]

    def _apply(self, b):
        if self.fast_op is not None:
            return self.fast_op._apply(b)
        mask = (jnp.arange(self.width)[None, :]
                < self.row_lengths[:, None])
        return lookup("ell_spmv")(self.col_idx, self.values, b, mask)

    @classmethod
    def from_data(cls, data: MatrixData, dtype=None, index_dtype=jnp.int32,
                  width: int | None = None, allow_truncate: bool = False,
                  fast: bool = True):
        d = data.canonical()
        n, m = d.shape
        lengths = np.diff(d.row_ptrs())
        w = int(lengths.max()) if width is None and d.nnz else width
        w = max(w if w is not None else 1, 1)
        if (not allow_truncate and d.nnz
                and int(lengths.max()) > w):
            raise ValueError(
                f"row with {int(lengths.max())} entries exceeds the imposed "
                f"ELL width {w} (pass allow_truncate=True to drop overflow)")
        cols = np.zeros((n, w), np.int64)
        vals = np.zeros((n, w), d.values.dtype if dtype is None else dtype)
        pos = np.concatenate([np.arange(l) for l in lengths]) if d.nnz else \
            np.zeros(0, np.int64)
        keep = pos < w
        cols[d.row_idx[keep], pos[keep]] = d.col_idx[keep]
        vals[d.row_idx[keep], pos[keep]] = d.values[keep]
        fast_op = None
        if fast:
            from .fastpath import plan_fast_spmv
            kept = MatrixData((n, m), d.row_idx[keep], d.col_idx[keep],
                              d.values[keep].astype(vals.dtype))
            fast_op = plan_fast_spmv(kept, kept.values, index_dtype)
        return cls(col_idx=jnp.asarray(cols, index_dtype),
                   values=jnp.asarray(vals),
                   row_lengths=jnp.asarray(np.minimum(lengths, w), index_dtype),
                   shape=(n, m), nnz=int(keep.sum()), fast_op=fast_op)

    def to_dense(self):
        mask = (jnp.arange(self.width)[None, :] < self.row_lengths[:, None])
        rows = jnp.broadcast_to(
            jnp.arange(self.shape[0])[:, None], self.col_idx.shape)
        return jnp.zeros(self.shape, self.values.dtype).at[
            rows, self.col_idx].add(jnp.where(mask, self.values, 0))

    def to_csr(self, **kwargs):
        from .csr import Csr
        return Csr.from_data(self.to_matrix_data(), **kwargs)


    def compute_absolute(self):
        """|A| entrywise (AbsoluteComputable; abs over value leaves)."""
        from ..base.linop import absolute_of_storage
        return absolute_of_storage(self)

    def to_matrix_data(self) -> MatrixData:
        cols = np.asarray(self.col_idx)
        vals = np.asarray(self.values)
        lens = np.asarray(self.row_lengths)
        mask = np.arange(self.width)[None, :] < lens[:, None]
        r, c = np.nonzero(mask)
        return MatrixData(self.shape, r.astype(np.int32), cols[r, c],
                          vals[r, c]).sort_row_major()
