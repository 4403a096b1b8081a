"""COO format (``include/ginkgo/core/matrix/coo.hpp:50``).

Static-shape convention: arrays are padded to ``nnz_stored >= nnz`` with
``row = num_rows, col = 0, val = 0`` — the segment-sum SpMV drops the
``num_rows`` segment, so padding is numerically inert while every shape stays
XLA-static (Ginkgo's dynamic nnz becomes a build-time padded capacity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..ops.registry import lookup


def pad_nnz(nnz: int, multiple: int) -> int:
    return max(multiple, -(-nnz // multiple) * multiple)


@linop_dataclass
class Coo(LinOp):
    row_idx: jnp.ndarray   # (nnz_stored,) int
    col_idx: jnp.ndarray   # (nnz_stored,) int
    values: jnp.ndarray    # (nnz_stored,)
    shape: tuple = static_field()
    nnz: int = static_field()
    fast_op: object = None  # SpmvPlan TPU fast path (matrix/fastpath.py)

    def _apply(self, b):
        if self.fast_op is not None:
            return self.fast_op._apply(b)
        return lookup("coo_spmv")(self.row_idx, self.col_idx, self.values,
                                  b, self.shape[0])

    # -- construction ---------------------------------------------------------
    @classmethod
    def from_data(cls, data: MatrixData, dtype=None, index_dtype=jnp.int32,
                  pad_multiple: int = 8, fast: bool = True):
        d = data.canonical()
        nnz = d.nnz
        cap = pad_nnz(nnz, pad_multiple)
        rows = np.full(cap, d.shape[0], np.int64)
        cols = np.zeros(cap, np.int64)
        vals = np.zeros(cap, d.values.dtype if dtype is None else dtype)
        rows[:nnz] = d.row_idx
        cols[:nnz] = d.col_idx
        vals[:nnz] = d.values
        fast_op = None
        if fast and nnz:
            from .fastpath import plan_fast_spmv
            fast_op = plan_fast_spmv(
                d, d.values.astype(vals.dtype), index_dtype)
        return cls(row_idx=jnp.asarray(rows, index_dtype),
                   col_idx=jnp.asarray(cols, index_dtype),
                   values=jnp.asarray(vals), shape=d.shape, nnz=nnz,
                   fast_op=fast_op)

    # -- conversions ------------------------------------------------------------
    def to_dense(self):
        return jnp.zeros(self.shape, self.values.dtype).at[
            self.row_idx, self.col_idx].add(self.values, mode="drop")

    def to_csr(self, strategy="classical"):
        """Device-side conversion (classical layout). Non-classical
        strategies need host-side layout processing and therefore concrete
        (non-traced) arrays — they route through from_data."""
        from .csr import Csr
        if strategy not in ("classical", "load_balance", "merge_path",
                            "sparselib"):
            import jax.core
            if isinstance(self.values, jax.core.Tracer):
                raise ValueError(
                    f"strategy {strategy!r} needs build-time (non-traced) "
                    "arrays; convert outside jit or use 'classical'")
            return Csr.from_data(self.to_matrix_data(), strategy=strategy,
                                 dtype=self.values.dtype)
        counts = jnp.where(
            jnp.arange(self.row_idx.shape[0]) < self.nnz,
            jnp.ones_like(self.row_idx), jnp.zeros_like(self.row_idx))
        row_ptr = jnp.zeros(self.shape[0] + 1, self.row_idx.dtype).at[
            self.row_idx + 1].add(counts, mode="drop")
        row_ptr = jnp.cumsum(row_ptr).astype(self.row_idx.dtype)
        return Csr(row_ptr=row_ptr, col_idx=self.col_idx, values=self.values,
                   row_idx=self.row_idx, shape=self.shape, nnz=self.nnz)

    def transpose(self):
        """Device-side transpose: stable re-sort by (col, row); padded
        entries keep sorting last so the result stays row-major-sorted.
        Two stable argsorts (lexsort) — no composite keys, so no int32
        overflow when jax_enable_x64 is off."""
        pad = self.row_idx >= self.shape[0]
        primary = jnp.where(pad, self.shape[1], self.col_idx)
        o1 = jnp.argsort(self.row_idx, stable=True)
        order = o1[jnp.argsort(primary[o1], stable=True)]
        pad_s = pad[order]
        new_rows = jnp.where(pad_s, self.shape[1], self.col_idx[order])
        new_cols = jnp.where(pad_s, 0, self.row_idx[order])
        return Coo(row_idx=new_rows, col_idx=new_cols,
                   values=jnp.where(pad_s, 0, self.values[order]),
                   shape=(self.shape[1], self.shape[0]), nnz=self.nnz)

    def conj_transpose(self):
        t = self.transpose()
        return Coo(row_idx=t.row_idx, col_idx=t.col_idx,
                   values=jnp.conj(t.values), shape=t.shape, nnz=t.nnz)

    def extract_diagonal(self):
        from .diagonal import Diagonal
        # concrete data on the CPU backend: one numpy pass beats paying
        # an XLA scatter compile per level shape (AMG hierarchies hit
        # this once per level at generate time)
        if (jax.default_backend() == "cpu"
                and not isinstance(self.values, jax.core.Tracer)):
            rows = np.asarray(self.row_idx)[:self.nnz]
            cols = np.asarray(self.col_idx)[:self.nnz]
            vals = np.asarray(self.values)[:self.nnz]
            m = rows == cols
            diag = np.zeros(min(self.shape), vals.dtype)
            np.add.at(diag, rows[m], vals[m])
            return Diagonal(values=jnp.asarray(diag))
        on_diag = (self.row_idx == self.col_idx)
        diag = jnp.zeros(min(self.shape), self.values.dtype).at[
            jnp.where(on_diag, self.row_idx, min(self.shape))].add(
            jnp.where(on_diag, self.values, 0), mode="drop")
        return Diagonal(values=diag)


    def compute_absolute(self):
        """|A| entrywise (AbsoluteComputable; abs over value leaves)."""
        from ..base.linop import absolute_of_storage
        return absolute_of_storage(self)

    def to_matrix_data(self) -> MatrixData:
        rows = np.asarray(self.row_idx)[:self.nnz]
        cols = np.asarray(self.col_idx)[:self.nnz]
        vals = np.asarray(self.values)[:self.nnz]
        return MatrixData(self.shape, rows, cols, vals)
