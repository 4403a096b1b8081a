"""Device-side COO canonicalization.

Analog of the ``device_matrix_data`` kernels
(``core/base/device_matrix_data_kernels.hpp:22-52``: sort_row_major,
sum_duplicates, remove_zeros) expressed jit-compatibly: all outputs keep the
input's static capacity, with padding entries (row = num_rows, val = 0) that
every downstream kernel already treats as inert.  This closes the loop for
fully on-device assembly (jax_assembly example): device-built triplets can
be canonicalized and consumed without a host round trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_row_major(rows, cols, vals, num_rows, num_cols):
    """Stable sort by (row, col); padding (row >= num_rows) sorts last.
    Two stable argsorts (lexsort) — overflow-safe without x64."""
    order1 = jnp.argsort(cols, stable=True)
    primary = jnp.minimum(rows, num_rows)[order1]
    order = order1[jnp.argsort(primary, stable=True)]
    return rows[order], cols[order], vals[order]


def sum_duplicates(rows, cols, vals, num_rows, num_cols):
    """Combine duplicate (row, col) entries in-place (static capacity):
    result is row-major sorted, deduplicated, padded at the tail; also
    returns the traced nnz."""
    rows, cols, vals = sort_row_major(rows, cols, vals, num_rows, num_cols)
    valid = rows < num_rows
    same = (rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1])
    is_new = jnp.concatenate([valid[:1], (~same) & valid[1:]])
    # destination slot of each entry = (#new groups before it) - 1
    slot = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    cap = rows.shape[0]
    dest = jnp.where(valid, slot, cap)
    out_vals = jnp.zeros(cap + 1, vals.dtype).at[dest].add(vals)[:cap]
    out_rows = jnp.full(cap + 1, num_rows, rows.dtype).at[
        jnp.where(is_new, slot, cap)].set(
        jnp.where(is_new, rows, num_rows))[:cap]
    out_cols = jnp.zeros(cap + 1, cols.dtype).at[
        jnp.where(is_new, slot, cap)].set(
        jnp.where(is_new, cols, 0))[:cap]
    nnz = jnp.sum(is_new.astype(jnp.int32))
    return out_rows, out_cols, out_vals, nnz


def remove_zeros(rows, cols, vals, num_rows):
    """Turn explicit zeros into padding (capacity preserved)."""
    zero = vals == 0
    return (jnp.where(zero, num_rows, rows),
            jnp.where(zero, 0, cols), vals)


def canonicalize_device(coo):
    """Full device canonicalization of a Coo operator (returns a new Coo
    with the same capacity; padded tail inert). Jit-compatible.

    Order matches MatrixData.canonical(): duplicates are summed FIRST so
    entries that cancel to zero are removed (a second dedup pass compacts
    the holes left by zero removal — it is a no-op on the values since no
    duplicates remain)."""
    import dataclasses
    n, m = coo.shape
    r, c, v = coo.row_idx, coo.col_idx, coo.values
    r, c, v, _ = sum_duplicates(r, c, v, n, m)
    r, c, v = remove_zeros(r, c, v, n)
    r, c, v, _ = sum_duplicates(r, c, v, n, m)
    return dataclasses.replace(coo, row_idx=r, col_idx=c, values=v)
