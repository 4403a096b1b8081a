"""Shared TPU SpMV fast path for the non-CSR format zoo.

The reference ships a tuned SpMV kernel per format
(``common/cuda_hip/matrix/{coo,ell,sellp}_kernels.cpp``, hybrid split
``include/ginkgo/core/matrix/hybrid.hpp:42``).  The TPU answer is
different: *one* pair of roofline layouts (banded DIA + packed-slot
windowed-ELL, ops/spmv_pallas.py / ops/spmv_packed.py) that every format
can plan into at build time.  Ell is a degenerate packed layout, Hybrid's
ELL+COO split is exactly packed+tail, Sellp/Coo route by conversion —
so instead of four more Pallas kernels, each format builds a ``SpmvPlan``
aux operator and delegates its ``_apply`` to it.

The format's own arrays remain the canonical storage (conversions,
``to_matrix_data``, scaling); the plan is a device-side acceleration
cache.  Storage cost is ~2x when the plan is accepted — the price of the
~600x throughput gap between the streamed layouts and the 7 ns/element
gather tier (CLAUDE.md measured numbers).  Pass ``fast=False`` to
``from_data`` to opt out.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class SpmvPlan(LinOp):
    """Banded/packed layout + COO tail, no classical storage.

    Internal-only operator: carries exactly the aux arrays the fast
    kernels need (same attribute names as ``Csr``'s aux fields, so
    ``csr.fast_spmv_apply`` serves both).  Not a full format — no
    conversions, no classical fallback.
    """

    shape: tuple = static_field()
    strategy: str = static_field()
    diag_offsets: object = static_field(default=None)
    band_meta: object = static_field(default=None)
    diag_values: jnp.ndarray | None = None
    tail_rows: jnp.ndarray | None = None
    tail_cols: jnp.ndarray | None = None
    tail_vals: jnp.ndarray | None = None
    pell_meta: object = static_field(default=None)
    pell_vals: jnp.ndarray | None = None
    pell_idx: jnp.ndarray | None = None
    pell_qw: jnp.ndarray | None = None
    pell_xbase: jnp.ndarray | None = None

    def _apply(self, b):
        from .csr import fast_spmv_apply
        y = fast_spmv_apply(self, b)
        if y is None:  # pragma: no cover - plan is only built when accepted
            raise RuntimeError("SpmvPlan built without a fast layout")
        return y


def plan_fast_spmv(d, values_np, index_dtype=jnp.int32):
    """Run the CSR ``automatical`` acceptance on canonical data and return
    a :class:`SpmvPlan` (banded or packed) or ``None`` when neither layout
    is economical (the format then keeps its own gather path)."""
    from .csr import _process_strategy, aux_device_kw
    (strategy, diag_offsets, band_meta, diag_values,
     tail, pell) = _process_strategy("automatical", d, values_np)
    if strategy == "classical":
        return None
    kw = aux_device_kw(d.shape[0], values_np.dtype, index_dtype, tail, pell)
    return SpmvPlan(shape=d.shape, strategy=strategy,
                    diag_offsets=diag_offsets, band_meta=band_meta,
                    diag_values=None if diag_values is None
                    else jnp.asarray(diag_values), **kw)
