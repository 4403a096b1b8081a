"""Permutation and ScaledPermutation operators.

Analog of ``include/ginkgo/core/matrix/permutation.hpp:111`` /
``scaled_permutation.hpp:36``.  ``permute_mode`` mirrors Ginkgo's enum:
rows / columns / symmetric (x) inverse variants.  On device a permutation is
just a gather — XLA compiles it to a copy with index remap.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field


class permute_mode(enum.Flag):
    none = 0
    rows = 1
    columns = 2
    inverse = 4
    symmetric = rows | columns
    inverse_rows = inverse | rows
    inverse_columns = inverse | columns
    inverse_symmetric = inverse | rows | columns


@linop_dataclass
class Permutation(LinOp):
    """x = b[perm]: row-permutation as a LinOp."""

    perm: jnp.ndarray   # (n,) destination row i takes source row perm[i]

    @property
    def shape(self):
        n = self.perm.shape[0]
        return (n, n)

    def _apply(self, b):
        return b[self.perm]

    def inverse(self):
        inv = jnp.zeros_like(self.perm).at[self.perm].set(
            jnp.arange(self.perm.shape[0], dtype=self.perm.dtype))
        return Permutation(perm=inv)

    def transpose(self):
        return self.inverse()

    def conj_transpose(self):
        return self.inverse()

    def to_dense(self):
        n = self.perm.shape[0]
        return jnp.zeros((n, n)).at[jnp.arange(n), self.perm].set(1.0)

    @classmethod
    def from_indices(cls, perm, index_dtype=jnp.int32):
        return cls(perm=jnp.asarray(np.asarray(perm), index_dtype))


@linop_dataclass
class ScaledPermutation(LinOp):
    """x = scale * b[perm] (``scaled_permutation.hpp:36``)."""

    perm: jnp.ndarray
    scale: jnp.ndarray  # (n,)

    @property
    def shape(self):
        n = self.perm.shape[0]
        return (n, n)

    def _apply(self, b):
        return self.scale[:, None].astype(b.dtype) * b[self.perm]

    def inverse(self):
        n = self.perm.shape[0]
        inv = jnp.zeros_like(self.perm).at[self.perm].set(
            jnp.arange(n, dtype=self.perm.dtype))
        inv_scale = (1.0 / self.scale)[inv]
        return ScaledPermutation(perm=inv, scale=inv_scale)

    def to_dense(self):
        n = self.perm.shape[0]
        return jnp.zeros((n, n), self.scale.dtype).at[
            jnp.arange(n), self.perm].set(self.scale)

    @classmethod
    def from_indices(cls, perm, scale, index_dtype=jnp.int32):
        return cls(perm=jnp.asarray(np.asarray(perm), index_dtype),
                   scale=jnp.asarray(scale))


def permute_data(data, perm: np.ndarray, mode: permute_mode):
    """Host-side matrix permutation (Ginkgo's Csr::permute): returns new
    MatrixData with rows/cols remapped.  ``perm`` as in Permutation: output
    row i = input row perm[i]."""
    from ..base.matrix_data import MatrixData
    perm = np.asarray(perm)
    inv = np.zeros_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    r, c = data.row_idx.copy(), data.col_idx.copy()
    row_map = perm if (mode & permute_mode.inverse) else inv
    col_map = row_map
    if mode & permute_mode.rows:
        r = row_map[r]
    if mode & permute_mode.columns:
        c = col_map[c]
    return MatrixData(data.shape, r, c, data.values).sort_row_major()
