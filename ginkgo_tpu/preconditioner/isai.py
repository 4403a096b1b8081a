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
    batched device solve).

    The (n, S, S) block fill has no Python loops (the reference generates
    these blocks on device, ``common/cuda_hip/preconditioner/
    isai_kernels.cpp``): the native ``gt_isai_fill`` merges each pattern
    row against A's rows with two sorted pointers — O(Σ_b (m + deg(J_b)))
    — and the numpy fallback materializes the Σ mᵢ² pair list with
    repeat/arange group arithmetic and looks it up in A by sorted
    (row, col) key."""
    data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
    d = data.canonical()
    n = d.shape[0]
    dtype = d.values.dtype
    pattern = _restrict_triangular(_power_pattern(d, sparsity_power), mode)

    # ensure the diagonal is in every row's pattern (skip the re-sort
    # entirely when it already is — the power-1 case on PDE matrices)
    have = np.zeros(n, bool)
    have[pattern.row_idx[pattern.row_idx == pattern.col_idx]] = True
    if not have.all():
        diag = np.flatnonzero(~have).astype(np.int64)
        pattern = MatrixData(
            (n, n),
            np.concatenate([pattern.row_idx.astype(np.int64), diag]),
            np.concatenate([pattern.col_idx.astype(np.int64), diag]),
            np.ones(pattern.nnz + diag.size, dtype)).canonical()

    ptr = pattern.row_ptrs()                       # (n+1,)
    lens = np.diff(ptr)                            # (n,) >= 1 (diagonal)
    S = int(lens.max())
    prow = pattern.row_idx.astype(np.int64)        # (nnzp,)
    pcol = pattern.col_idx.astype(np.int64)
    nnzp = prow.shape[0]
    a_slot = np.arange(nnzp) - ptr[prow]           # position within row

    cols_pad = np.zeros((n, S), np.int64)
    valid = np.zeros((n, S), bool)
    cols_pad[prow, a_slot] = pcol
    valid[prow, a_slot] = True

    wide = np.complex128 if np.iscomplexobj(d.values) else np.float64
    subs = rhs = None
    if d.nnz:
        from ..native import isai_fill_native
        # identity base guards singular padding; the kernel clears and
        # fills each live (m, m) region in place.  zeros + one strided
        # diagonal write beats np.tile's full (n, S, S) broadcast copy.
        subs_w = np.zeros((n, S, S), wide)
        subs_w[:, np.arange(S), np.arange(S)] = 1.0
        rhs_w = np.zeros((n, S), wide)
        if isai_fill_native(S, d.row_ptrs(),
                            np.ascontiguousarray(d.col_idx, np.int64),
                            np.array(d.values, wide, copy=True),
                            ptr, pcol, subs_w, rhs_w):
            subs = subs_w.astype(dtype, copy=False)
            rhs = rhs_w.astype(dtype, copy=False)
    if subs is None:
        # numpy fallback: pair list — every entry e (slot a of row i)
        # against every slot b of the same row, Σ mᵢ² pairs via group
        # repeat/arange, then one sorted-key lookup into canonical d
        cnt = lens[prow]                           # pairs per entry
        pair_a = np.repeat(np.arange(nnzp), cnt)   # entry index for slot a
        total = int(cnt.sum())
        b_local = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        row_of = prow[pair_a]
        ja = pcol[pair_a]
        jb = pcol[ptr[row_of] + b_local]
        if d.nnz:
            akeys = d.row_idx.astype(np.int64) * n + d.col_idx
            qkeys = jb * n + ja
            loc = np.minimum(np.searchsorted(akeys, qkeys), d.nnz - 1)
            pair_vals = np.where(akeys[loc] == qkeys,
                                 d.values[loc], 0.0).astype(dtype)
        else:
            pair_vals = np.zeros(total, dtype)
        subs = np.tile(np.eye(S, dtype=dtype), (n, 1, 1))
        subs[row_of, a_slot[pair_a], b_local] = pair_vals
        rhs = np.zeros((n, S), dtype)
        on_diag = pcol == prow
        rhs[prow[on_diag], a_slot[on_diag]] = 1.0

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
