"""ScaledReordered — apply reordering/scaling around an inner operator.

Analog of ``include/ginkgo/core/reorder/scaled_reordered.hpp``: wraps an
inner solver so that solves of A x = b happen in the reordered/scaled basis
(e.g. Mc64-stabilised LU, reordered-preconditioned-solver example):

    A' = R_s P A Pᵀ C_s,  solve A' y = R_s P b,  x = Pᵀ C_s y
"""

from __future__ import annotations

import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..matrix.csr import Csr
from ..matrix.permutation import Permutation, permute_data, permute_mode


@linop_dataclass
class ScaledReorderedOp(LinOp):
    inner: LinOp
    perm: object            # Permutation / ScaledPermutation (row op)
    perm_inv: object
    shape: tuple = static_field()

    def _apply(self, b):
        y = self.perm._apply(b)
        y = self.inner._apply(y)
        return self.perm_inv._apply(y)


class ScaledReordered:
    """Factory: ``ScaledReordered(inner_operator=solver_factory,
    reordering=Rcm.build()).generate(A)``."""

    def __init__(self, inner_operator, reordering=None):
        self.inner_operator = inner_operator
        self.reordering = reordering

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> ScaledReorderedOp:
        from .rcm import Rcm
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        reorder = self.reordering if self.reordering is not None \
            else Rcm.build()
        P = reorder.generate(A) if hasattr(reorder, "generate") else reorder
        perm_idx = np.asarray(P.perm)
        scale = np.asarray(getattr(P, "scale", np.ones(len(perm_idx))))
        col_scale = getattr(P, "col_scale", None)
        if col_scale is not None:
            # two-sided result (Mc64): A' = S_r P A C_s — rows permuted
            # and scaled, columns scaled in place.  Solve A x = b as
            # A' y = S_r P b with x = C_s y (scaled_reordered.hpp's
            # Composition branch).
            from ..matrix.permutation import ScaledPermutation
            cs = np.asarray(col_scale)
            d = permute_data(data, perm_idx, permute_mode.rows)
            d.values = d.values * scale[d.row_idx] * cs[d.col_idx]
            A_prime = Csr.from_data(d)
            inner = self.inner_operator
            if hasattr(inner, "generate"):
                inner = inner.generate(A_prime)
            return ScaledReorderedOp(
                inner=inner,
                perm=ScaledPermutation.from_indices(perm_idx, scale),
                perm_inv=ScaledPermutation.from_indices(
                    np.arange(len(cs)), cs),
                shape=(data.shape[0], data.shape[1]))
        # symmetric permutation + row scaling: A' = S P A Pᵀ
        d = permute_data(data, perm_idx, permute_mode.symmetric)
        d.values = d.values * scale[d.row_idx]
        A_prime = Csr.from_data(d)
        inner = self.inner_operator
        if hasattr(inner, "generate"):
            inner = inner.generate(A_prime)
        return ScaledReorderedOp(
            inner=inner, perm=P,
            perm_inv=Permutation.from_indices(perm_idx).inverse(),
            shape=(data.shape[0], data.shape[1]))
