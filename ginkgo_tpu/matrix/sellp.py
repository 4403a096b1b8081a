"""SELL-P (sliced ELLPACK) format.

Analog of ``include/ginkgo/core/matrix/sellp.hpp:43`` (SELL-C-sigma family):
rows are grouped into slices of ``slice_size``; each slice is padded to its
own max row length rounded up to ``stride_factor``.  On TPU the (slice,
slice_size, width) planes are exactly the VPU-lane-friendly tiling; slices
bound padding waste the way SELL-C bounds it on SIMD CPUs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..ops.registry import lookup


@linop_dataclass
class Sellp(LinOp):
    col_idx: jnp.ndarray      # (num_slices, slice_size, width)
    values: jnp.ndarray       # (num_slices, slice_size, width)
    row_lengths: jnp.ndarray  # (num_slices, slice_size)
    shape: tuple = static_field()
    nnz: int = static_field()
    slice_size: int = static_field(default=64)

    @property
    def width(self):
        return self.values.shape[2]

    def _apply(self, b):
        mask = (jnp.arange(self.width)[None, None, :]
                < self.row_lengths[:, :, None])
        return lookup("sellp_spmv")(self.col_idx, self.values, b, mask,
                                    self.shape[0])

    @classmethod
    def from_data(cls, data: MatrixData, dtype=None, index_dtype=jnp.int32,
                  slice_size: int = 64, stride_factor: int = 8):
        d = data.canonical()
        n, m = d.shape
        ss = int(slice_size)
        num_slices = max(1, -(-n // ss))
        lengths = np.zeros(num_slices * ss, np.int64)
        lengths[:n] = np.diff(d.row_ptrs())
        per_slice = lengths.reshape(num_slices, ss)
        w = int(-(-(per_slice.max() if d.nnz else 1) // stride_factor)
                * stride_factor)
        w = max(w, 1)
        cols = np.zeros((num_slices, ss, w), np.int64)
        vals = np.zeros((num_slices, ss, w),
                        d.values.dtype if dtype is None else dtype)
        if d.nnz:
            pos = np.concatenate([np.arange(l) for l in lengths[:n]])
            sl = d.row_idx // ss
            lr = d.row_idx - sl * ss
            cols[sl, lr, pos] = d.col_idx
            vals[sl, lr, pos] = d.values
        return cls(col_idx=jnp.asarray(cols, index_dtype),
                   values=jnp.asarray(vals),
                   row_lengths=jnp.asarray(per_slice, index_dtype),
                   shape=(n, m), nnz=d.nnz, slice_size=ss)

    def to_dense(self):
        s, c, w = self.col_idx.shape
        mask = (jnp.arange(w)[None, None, :] < self.row_lengths[:, :, None])
        rows = jnp.broadcast_to(
            (jnp.arange(s)[:, None, None] * c
             + jnp.arange(c)[None, :, None]), self.col_idx.shape)
        flat = jnp.zeros((s * c, self.shape[1]), self.values.dtype).at[
            rows.reshape(-1), self.col_idx.reshape(-1)].add(
            jnp.where(mask, self.values, 0).reshape(-1))
        return flat[:self.shape[0]]

    def to_matrix_data(self) -> MatrixData:
        cols = np.asarray(self.col_idx)
        vals = np.asarray(self.values)
        lens = np.asarray(self.row_lengths)
        s, c, w = cols.shape
        mask = np.arange(w)[None, None, :] < lens[:, :, None]
        si, li, pi = np.nonzero(mask)
        rows = si * c + li
        keep = rows < self.shape[0]
        return MatrixData(self.shape, rows[keep].astype(np.int64),
                          cols[si, li, pi][keep],
                          vals[si, li, pi][keep]).sort_row_major()

    def to_csr(self, **kwargs):
        from .csr import Csr
        return Csr.from_data(self.to_matrix_data(), **kwargs)
