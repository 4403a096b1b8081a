"""csr_lookup — per-row column -> value-index lookup.

Analog of ``core/matrix/csr_lookup.hpp:26-57`` (sparsity_type full / bitmap /
hash): factorizations and SpGEMM-reuse need O(1) "where is column j in row
i" queries.  Host-side build; the device representation is a padded dense
(n, max_row_nnz) column table + searchsorted lookups (every row's columns
are sorted in canonical CSR), which is the TPU-friendly equivalent of the
reference's per-row hash tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import linop_dataclass, static_field


@linop_dataclass
class CsrLookup:
    cols_padded: jnp.ndarray     # (n, w) sorted columns, padded with m
    base: jnp.ndarray            # (n,) first value index of each row
    lengths: jnp.ndarray         # (n,)
    num_cols: int = static_field(default=0)

    @classmethod
    def build(cls, csr) -> "CsrLookup":
        d = csr.to_matrix_data()
        n, m = d.shape
        ptr = d.row_ptrs()
        lengths = np.diff(ptr)
        w = max(1, int(lengths.max()) if n else 1)
        cols = np.full((n, w), m, np.int64)
        pos = (np.concatenate([np.arange(l) for l in lengths])
               if d.nnz else np.zeros(0, np.int64))
        cols[d.row_idx, pos] = d.col_idx
        return cls(cols_padded=jnp.asarray(cols),
                   base=jnp.asarray(ptr[:-1]),
                   lengths=jnp.asarray(lengths), num_cols=m)

    def lookup(self, rows, cols):
        """Value index of entry (row, col); -1 when absent. Vectorised and
        jit-compatible."""
        rows = jnp.asarray(rows)
        cols = jnp.asarray(cols)
        table = self.cols_padded[rows]                   # (k, w)
        pos = jax_searchsorted_rows(table, cols)
        hit = (pos < self.lengths[rows]) & (
            jnp.take_along_axis(table, pos[:, None], 1)[:, 0] == cols)
        return jnp.where(hit, self.base[rows] + pos, -1)


def jax_searchsorted_rows(table, keys):
    """Per-row searchsorted: table (k, w) sorted rows, keys (k,)."""
    return jnp.sum(table < keys[:, None], axis=1)
