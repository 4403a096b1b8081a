"""Sparse matrix-vector product kernels, reference tier.

Reference-tier analogs of Ginkgo's per-format SpMV kernels
(``reference/matrix/csr_kernels.cpp:49-80`` triple loop etc.), expressed as
gather + segment-sum so XLA maps them to vectorised gathers and the padding
keeps all shapes static.  The TPU tier (Pallas) registers faster
implementations under the same names in ``ops/spmv_pallas.py``.

Conventions: multivectors are (n, k); padded entries carry
``col = 0, val = 0, row = num_rows`` (segment id == num_segments drops them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .registry import register


@register("coo_spmv", "reference")
def coo_spmv(row_idx, col_idx, values, b, num_rows):
    """y = A @ b for COO triplets (also the CSR classical fallback)."""
    gathered = b[col_idx] * values[:, None].astype(b.dtype)
    return jax.ops.segment_sum(gathered, row_idx, num_segments=num_rows + 1,
                               indices_are_sorted=True)[:num_rows]


@register("ell_spmv", "reference")
def ell_spmv(col_idx, values, b, valid_mask):
    """ELL: col_idx/values (n, max_nnz_row); y = sum_j vals[:,j]*b[cols[:,j]]."""
    gathered = b[col_idx]                            # (n, w, k)
    vals = jnp.where(valid_mask, values, 0).astype(b.dtype)
    return jnp.einsum("nw,nwk->nk", vals, gathered)


@register("dia_spmv", "reference")
def dia_spmv(offsets, dvb, meta, b):
    """Diagonal-offset (banded) SpMV: y[i] = sum_d diag[d, i] * b[i + off_d].

    Reference tier: unblock the (G, D, S, 128) build-time layout back to
    (D, n), pad b once by the band extent, and accumulate full-length
    statically-shifted slices — one fused elementwise sum, no gather.
    The Pallas TPU tier consumes the blocked layout directly.
    """
    from .spmv_pallas import unblock_diag_values
    diag_values = unblock_diag_values(dvb, meta)
    n = meta["n"]
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    xp = jnp.pad(b, ((lo, hi), (0, 0)))
    acc = diag_values[0][:, None].astype(b.dtype) * xp[lo + offsets[0]:
                                                       lo + offsets[0] + n]
    for d, off in enumerate(offsets[1:], start=1):
        acc = acc + diag_values[d][:, None].astype(b.dtype) * \
            xp[lo + off: lo + off + n]
    return acc


@register("dense_spmv", "reference")
def dense_spmv(a, b):
    return a @ b


# SELL-P uses the flat per-slice-padded layout and the coo_spmv kernel
# (matrix/sellp.py) — the padded-3D einsum variant was removed with it.
