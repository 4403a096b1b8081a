"""RowGatherer (local) — x = b[rows] as a LinOp.

Analog of ``include/ginkgo/core/matrix/row_gatherer.hpp:43``; the
distributed halo-exchange RowGatherer builds on the same gather
(``distributed/row_gatherer.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class RowGatherer(LinOp):
    rows: jnp.ndarray           # (num_out,) source row per output row
    num_cols: int = static_field(default=0)   # domain size

    @property
    def shape(self):
        return (self.rows.shape[0], self.num_cols)

    def _apply(self, b):
        return b[self.rows]

    def _apply_advanced(self, alpha, b, beta, x):
        return alpha * b[self.rows] + beta * x

    @classmethod
    def from_indices(cls, rows, num_cols: int, index_dtype=jnp.int32):
        return cls(rows=jnp.asarray(np.asarray(rows), index_dtype),
                   num_cols=int(num_cols))
