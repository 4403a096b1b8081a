"""SELL-P (sliced ELLPACK) format.

Analog of ``include/ginkgo/core/matrix/sellp.hpp:43`` (SELL-C-sigma family):
rows are grouped into slices of ``slice_size``; each slice is padded to ITS
OWN max row length rounded up to ``stride_factor`` — that per-slice stride
is the format's whole point (one long row only pads its own slice, unlike
ELL).  Storage is the flat per-slice-padded buffer with slice offsets
(Ginkgo's layout); the SpMV is the load-balanced gather + segment-sum over
the flat entries, which is also how the classical CSR strategy maps to the
VPU (SURVEY.md §2.12).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..ops.registry import lookup


@linop_dataclass
class Sellp(LinOp):
    col_flat: jnp.ndarray     # (total,) columns, slice-major padded, pad 0
    val_flat: jnp.ndarray     # (total,) values, pad 0
    row_flat: jnp.ndarray     # (total,) owning row, pad n
    shape: tuple = static_field()
    nnz: int = static_field()
    slice_size: int = static_field(default=64)
    slice_offsets: tuple = static_field(default=())   # per-slice start
    slice_widths: tuple = static_field(default=())    # per-slice stride
    fast_op: object = None  # SpmvPlan TPU fast path (matrix/fastpath.py)

    @property
    def num_slices(self):
        return len(self.slice_widths)

    @property
    def total_storage(self):
        return self.val_flat.shape[0]

    def _apply(self, b):
        if self.fast_op is not None:
            return self.fast_op._apply(b)
        return lookup("coo_spmv")(self.row_flat, self.col_flat,
                                  self.val_flat, b, self.shape[0])

    @classmethod
    def from_data(cls, data: MatrixData, dtype=None, index_dtype=jnp.int32,
                  slice_size: int = 64, stride_factor: int = 8,
                  fast: bool = True):
        d = data.canonical()
        n, m = d.shape
        ss = int(slice_size)
        num_slices = max(1, -(-n // ss))
        lengths = np.zeros(num_slices * ss, np.int64)
        lengths[:n] = np.diff(d.row_ptrs())
        per_slice = lengths.reshape(num_slices, ss)
        widths = np.maximum(
            -(-per_slice.max(axis=1) // stride_factor) * stride_factor, 1)
        offsets = np.concatenate([[0], np.cumsum(widths * ss)])
        total = int(offsets[-1])
        cols = np.zeros(total, np.int64)
        vals = np.zeros(total, d.values.dtype if dtype is None else dtype)
        rows = np.full(total, n, np.int64)
        if d.nnz:
            pos = np.concatenate([np.arange(l) for l in lengths[:n]])
            sl = d.row_idx // ss
            lr = d.row_idx - sl * ss
            flat = offsets[sl] + lr * widths[sl] + pos
            cols[flat] = d.col_idx
            vals[flat] = d.values
            rows[flat] = d.row_idx
        fast_op = None
        if fast and d.nnz:
            from .fastpath import plan_fast_spmv
            fast_op = plan_fast_spmv(
                d, d.values.astype(vals.dtype), index_dtype)
        return cls(col_flat=jnp.asarray(cols, index_dtype),
                   val_flat=jnp.asarray(vals),
                   row_flat=jnp.asarray(rows, index_dtype),
                   shape=(n, m), nnz=d.nnz, slice_size=ss,
                   slice_offsets=tuple(int(o) for o in offsets[:-1]),
                   slice_widths=tuple(int(w) for w in widths),
                   fast_op=fast_op)

    def to_dense(self):
        return jnp.zeros(self.shape, self.val_flat.dtype).at[
            self.row_flat, self.col_flat].add(self.val_flat, mode="drop")


    def compute_absolute(self):
        """|A| entrywise (AbsoluteComputable; abs over value leaves)."""
        from ..base.linop import absolute_of_storage
        return absolute_of_storage(self)

    def to_matrix_data(self) -> MatrixData:
        rows = np.asarray(self.row_flat)
        keep = rows < self.shape[0]
        vals = np.asarray(self.val_flat)[keep]
        nz = vals != 0
        return MatrixData(self.shape, rows[keep][nz],
                          np.asarray(self.col_flat)[keep][nz],
                          vals[nz]).sort_row_major()

    def to_csr(self, **kwargs):
        from .csr import Csr
        return Csr.from_data(self.to_matrix_data(), **kwargs)
