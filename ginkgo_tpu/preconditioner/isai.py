"""ISAI — incomplete sparse approximate inverse preconditioner.

Analog of ``include/ginkgo/core/preconditioner/isai.hpp:78-95`` /
``core/preconditioner/isai.cpp:123-220`` (SURVEY.md A.5): the approximate
inverse M carries the sparsity pattern of A^``sparsity_power``; each row
m_i solves the small dense system  A(J_i, J_i)ᵀ m = e_i  restricted to its
pattern J_i.

TPU-native design: all rows are padded to the max pattern size S and the n
small systems become ONE vmapped (n, S, S) batched solve on the MXU —
Ginkgo's per-row subwarp kernels and its "excess system" fallback collapse
into a single batched solve (pad rows simply make S larger; no separate
excess path is needed because padding is identity-filled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..matrix.csr import Csr
from ..ops.spgemm import spgemm_data


def _power_pattern(d: MatrixData, power: int) -> MatrixData:
    pat = MatrixData(d.shape, d.row_idx, d.col_idx,
                     np.ones_like(d.values))
    out = pat
    for _ in range(power - 1):
        out = spgemm_data(out, pat)
        out.values[:] = 1.0
    return out.canonical()


def _restrict_triangular(p: MatrixData, mode: str) -> MatrixData:
    if mode == "lower":
        keep = p.row_idx >= p.col_idx
    elif mode == "upper":
        keep = p.row_idx <= p.col_idx
    else:
        return p
    return MatrixData(p.shape, p.row_idx[keep], p.col_idx[keep],
                      p.values[keep])


def generate_isai(A, sparsity_power: int = 1, mode: str = "general") -> Csr:
    """Build the approximate-inverse Csr for A (host symbolic + one
    batched device solve)."""
    data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
    d = data.canonical()
    n = d.shape[0]
    dtype = d.values.dtype
    pattern = _restrict_triangular(_power_pattern(d, sparsity_power), mode)

    # per-row pattern lists
    rows_of = [[] for _ in range(n)]
    for i, j in zip(pattern.row_idx, pattern.col_idx):
        rows_of[int(i)].append(int(j))
    # make sure the diagonal is in every pattern
    for i in range(n):
        if i not in rows_of[i]:
            rows_of[i].append(i)
        rows_of[i].sort()
    S = max(len(r) for r in rows_of)

    dense_a = {(int(i), int(j)): v
               for i, j, v in zip(d.row_idx, d.col_idx, d.values)}
    subs = np.tile(np.eye(S, dtype=dtype), (n, 1, 1))
    rhs = np.zeros((n, S), dtype)
    cols_pad = np.zeros((n, S), np.int64)
    valid = np.zeros((n, S), bool)
    for i, J in enumerate(rows_of):
        m = len(J)
        cols_pad[i, :m] = J
        valid[i, :m] = True
        # A(J, J) transposed: solving A(J,J)^T m = e_i(J)
        for a, ja in enumerate(J):
            for b, jb in enumerate(J):
                subs[i, a, b] = dense_a.get((jb, ja), 0.0)
            if ja == i:
                rhs[i, a] = 1.0
        # guard singular padding
        for a in range(m, S):
            subs[i, a, a] = 1.0

    from ..ops.gauss_jordan import batched_solve
    sols = batched_solve(jnp.asarray(subs), jnp.asarray(rhs))   # (n, S)
    sols = np.asarray(sols)
    ri, ci = np.nonzero(valid)
    m_data = MatrixData((n, n), ri.astype(np.int64),
                        cols_pad[ri, ci], sols[ri, ci])
    return Csr.from_data(m_data.canonical(), strategy="automatical")


@linop_dataclass
class SpdIsai(LinOp):
    """spd variant: M = L⁻ᴴ_approx · L⁻¹_approx (isai.cpp spd path)."""

    linv: Csr
    linv_h: Csr

    @property
    def shape(self):
        return self.linv.shape

    def _apply(self, b):
        return self.linv_h._apply(self.linv._apply(b))


class Isai:
    """Factory: ``Isai(mode='general'|'lower'|'upper'|'spd',
    sparsity_power=1).generate(A)``."""

    def __init__(self, mode: str = "general", sparsity_power: int = 1):
        if mode not in ("general", "lower", "upper", "spd"):
            raise ValueError(f"unknown ISAI mode {mode!r}")
        self.mode = mode
        self.sparsity_power = sparsity_power

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> LinOp:
        if self.mode == "spd":
            from ..factorization.par_ilu import Ic0
            L = Ic0().generate(A).l_factor
            linv = generate_isai(L, self.sparsity_power, "lower")
            lt = linv.to_matrix_data().conj_transpose().sort_row_major()
            return SpdIsai(linv=linv,
                           linv_h=Csr.from_data(lt, strategy="automatical"))
        return generate_isai(A, self.sparsity_power, self.mode)
