"""Diagonal operator (``include/ginkgo/core/matrix/diagonal.hpp``).

Supports apply (scale rows), inverse_apply, and left/right-scaling of other
operators — used by scalar Jacobi and matrix equilibration.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass
from ..base.matrix_data import MatrixData


@linop_dataclass
class Diagonal(LinOp):
    values: jnp.ndarray  # (n,)

    @property
    def shape(self):
        n = self.values.shape[0]
        return (n, n)

    def _apply(self, b):
        return self.values[:, None].astype(b.dtype) * b

    def inverse_apply(self, b):
        from ..base.linop import as_multivector
        b2, squeeze = as_multivector(b)
        out = b2 / self.values[:, None].astype(b2.dtype)
        return out[:, 0] if squeeze else out

    def rapply(self, b):
        """Column scaling ``b @ D`` (``diagonal.hpp:151``): scales the j-th
        column of b by values[j]; b is (k, n) here."""
        return b * self.values[None, :].astype(b.dtype)

    def inverse(self):
        return Diagonal(values=1.0 / self.values)

    def compute_absolute(self):
        return Diagonal(values=jnp.abs(self.values))

    def conj_transpose(self):
        return Diagonal(values=jnp.conj(self.values))

    def transpose(self):
        return self

    def to_dense(self):
        return jnp.diag(self.values)

    @classmethod
    def from_data(cls, data: MatrixData, dtype=None):
        import numpy as np
        d = data.canonical()
        diag = np.zeros(min(d.shape), d.values.dtype)
        on_diag = d.row_idx == d.col_idx
        diag[d.row_idx[on_diag]] = d.values[on_diag]
        return cls(values=jnp.asarray(diag, dtype=dtype))
