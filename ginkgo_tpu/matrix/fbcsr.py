"""Fbcsr — fixed-size block CSR.

Analog of ``include/ginkgo/core/matrix/fbcsr.hpp:99``: the matrix is tiled
into bs x bs dense blocks; only nonzero blocks are stored.  On TPU this is
the *best* sparse format for block-structured problems: SpMV is a gather of
b-blocks followed by one batched (nnzb, bs, bs) x (nnzb, bs, k) einsum that
lands on the MXU — Ginkgo's register-blocking becomes systolic-array tiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData


@linop_dataclass
class Fbcsr(LinOp):
    block_rows: jnp.ndarray   # (nnzb,) block-row index, padded with nbr
    block_cols: jnp.ndarray   # (nnzb,) block-col index, padded with 0
    blocks: jnp.ndarray       # (nnzb, bs, bs) dense blocks
    shape: tuple = static_field()
    block_size: int = static_field()
    nnzb: int = static_field()
    fast_op: object = None    # SpmvPlan TPU fast path (matrix/fastpath.py)

    def _apply(self, b):
        if self.fast_op is not None:
            return self.fast_op._apply(b)
        n, m = self.shape
        bs = self.block_size
        nbr = -(-n // bs)
        nbc = -(-m // bs)
        k = b.shape[1]
        pad_m = nbc * bs - m
        bp = jnp.pad(b, ((0, pad_m), (0, 0))) if pad_m else b
        b_blocks = bp.reshape(nbc, bs, k)
        gathered = b_blocks[self.block_cols]               # (nnzb, bs, k)
        from .dense import _acc_dtype
        prod = jnp.einsum(
            "bij,bjk->bik", self.blocks.astype(b.dtype), gathered,
            preferred_element_type=_acc_dtype(b.dtype)).astype(b.dtype)
        out = jax.ops.segment_sum(prod, self.block_rows,
                                  num_segments=nbr + 1)[:nbr]
        return out.reshape(nbr * bs, k)[:n]

    @classmethod
    def from_data(cls, data: MatrixData, block_size: int = 4, dtype=None,
                  index_dtype=jnp.int32, pad_multiple: int = 8,
                  fast: bool = True):
        d = data.canonical()
        n, m = d.shape
        bs = int(block_size)
        br = d.row_idx // bs
        bc = d.col_idx // bs
        keys = br.astype(np.int64) * (-(-m // bs)) + bc
        uniq, inv = np.unique(keys, return_inverse=True)
        nnzb = uniq.shape[0]
        cap = max(pad_multiple, -(-max(nnzb, 1) // pad_multiple)
                  * pad_multiple)
        vdtype = d.values.dtype if dtype is None else dtype
        blocks = np.zeros((cap, bs, bs), vdtype)
        li = d.row_idx - br * bs
        lj = d.col_idx - bc * bs
        np.add.at(blocks, (inv, li, lj), d.values.astype(vdtype))
        rows = np.full(cap, -(-n // bs), np.int64)
        cols = np.zeros(cap, np.int64)
        rows[:nnzb] = uniq // (-(-m // bs))
        cols[:nnzb] = uniq % (-(-m // bs))
        fast_op = None
        if fast and d.nnz:
            from .fastpath import plan_fast_spmv
            fast_op = plan_fast_spmv(d, d.values.astype(vdtype),
                                     index_dtype)
        return cls(block_rows=jnp.asarray(rows, index_dtype),
                   block_cols=jnp.asarray(cols, index_dtype),
                   blocks=jnp.asarray(blocks), shape=(n, m),
                   block_size=bs, nnzb=nnzb, fast_op=fast_op)

    def to_dense(self):
        n, m = self.shape
        bs = self.block_size
        nbr, nbc = -(-n // bs), -(-m // bs)
        dense = jnp.zeros((nbr + 1, bs, nbc, bs), self.blocks.dtype)
        dense = dense.at[self.block_rows, :, self.block_cols, :].add(
            self.blocks, mode="drop")
        return dense[:nbr].transpose(0, 1, 2, 3).reshape(
            nbr * bs, nbc * bs)[:n, :m]


    def compute_absolute(self):
        """|A| entrywise (AbsoluteComputable; abs over value leaves)."""
        from ..base.linop import absolute_of_storage
        return absolute_of_storage(self)

    def to_matrix_data(self) -> MatrixData:
        bs = self.block_size
        rows = np.asarray(self.block_rows)[:self.nnzb]
        cols = np.asarray(self.block_cols)[:self.nnzb]
        blocks = np.asarray(self.blocks)[:self.nnzb]
        li, lj = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
        r = (rows[:, None, None] * bs + li[None]).ravel()
        c = (cols[:, None, None] * bs + lj[None]).ravel()
        v = blocks.ravel()
        keep = (v != 0) & (r < self.shape[0]) & (c < self.shape[1])
        return MatrixData(self.shape, r[keep], c[keep],
                          v[keep]).sort_row_major()

    def to_csr(self, **kwargs):
        from .csr import Csr
        return Csr.from_data(self.to_matrix_data(), **kwargs)
