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

from functools import partial

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


@partial(jax.jit, static_argnames=("pad", "diag_slot"))
def _isai_subs_kernel(slab, vm, qmap, ob, pad, diag_slot):
    """(n, S, S) ISAI blocks from the DIA slab: S^2 row-gathers +
    shifts.  vm (n, S) is the pattern-slot validity mask (pattern
    entries can be missing at stencil boundaries — 'holes' in a
    diagonal); invalid slots get zeroed rows/columns and an identity
    pin so the batched solve stays nonsingular and returns 0 there."""
    from jax import lax
    n = slab.shape[1]
    S = ob.shape[0]
    slabz = jnp.concatenate(
        [slab, jnp.zeros((1, n), slab.dtype)], axis=0)
    slabp = jnp.pad(slabz, ((0, 0), (pad, pad)))

    def per_b(qcol, o):
        rows = slabp[qcol]                             # (S, n+2pad)
        return lax.dynamic_slice(
            rows, (jnp.int32(0), (pad + o).astype(jnp.int32)), (S, n))

    SUBS = jax.vmap(per_b, in_axes=(1, 0))(qmap, ob)   # (b, a, n)
    subs = jnp.transpose(SUBS, (2, 1, 0))              # (n, a, b)
    vmv = vm.astype(slab.dtype)
    subs = subs * (vmv[:, :, None] * vmv[:, None, :])
    subs = subs + (jnp.eye(S, dtype=slab.dtype)[None]
                   * (1 - vmv)[:, :, None])
    rhs = jnp.zeros((n, S), slab.dtype).at[:, diag_slot].set(1)
    return subs, rhs


def _isai_fill_dia(d, prow, pcol, nnzp):
    """Device-resident block fill for diagonal-structured matrices.

    When A and the ISAI pattern are both diagonal-structured (<= 64
    distinct diagonal offsets; boundary holes in a diagonal are fine —
    they come back as a validity mask), every row's block is the same
    offset-indexed gather
    ``subs[i, a, b] = A[i+o_b, i+o_a] = slab[q(o_a - o_b), i + o_b]``
    — S^2 row-gathers + shifts from the zero-padded DIA slab, no host
    (n, S, S) materialization and no 8-bytes-per-slot transfer (the
    reference fills these blocks on device too,
    common/cuda_hip/preconditioner/isai_kernels.cpp:160-210).

    Returns (subs, rhs, offs_pat) device arrays or None when the
    pattern does not qualify."""
    import jax.numpy as jnp
    from jax import dtypes
    n = d.shape[0]
    poff = pcol - prow
    offs_pat = np.unique(poff)
    if offs_pat.size > 64 or d.nnz == 0 or nnzp == 0:
        return None
    offsA = np.unique(d.col_idx.astype(np.int64) - d.row_idx)
    if offsA.size > 64:
        return None
    from ..factorization.par_ilut_dia import _dia_slab_device
    cdtype = dtypes.canonicalize_dtype(d.values.dtype)
    p = np.searchsorted(offsA, d.col_idx.astype(np.int64)
                        - d.row_idx).astype(np.int32)
    slab = _dia_slab_device(jnp.asarray(d.values.astype(cdtype)),
                            jnp.asarray(p),
                            jnp.asarray(d.row_idx.astype(np.int32)),
                            offsA.size, n)
    S = offs_pat.size
    # pattern validity mask (n, S): pattern diagonals have holes at
    # stencil boundaries, so slot validity comes from the pattern
    # itself, not a range check
    p_pat = np.searchsorted(offs_pat, poff).astype(np.int32)
    vm = _dia_slab_device(
        jnp.ones(nnzp, jnp.float32), jnp.asarray(p_pat),
        jnp.asarray(prow.astype(np.int32)), S, n).T
    diff = offs_pat[:, None] - offs_pat[None, :]       # (a, b)
    q = np.searchsorted(offsA, diff)
    qc = np.minimum(q, offsA.size - 1)
    qmap = np.where(offsA[qc] == diff, qc, offsA.size)  # -> zero row
    pad = int(max(int(np.abs(offs_pat).max()), 1))

    subs, rhs = _isai_subs_kernel(
        slab, vm, jnp.asarray(qmap.astype(np.int32)),
        jnp.asarray(offs_pat.astype(np.int32)), pad=pad,
        diag_slot=int(np.searchsorted(offs_pat, 0)))
    return subs, rhs, offs_pat


@partial(jax.jit, static_argnames=("n", "S"))
def _isai_packed_kernel(avals, dest, loc, hit, dslot, n, S):
    """Device-resident unstructured block fill + batched solve: an
    identity-initialized (n, S, S) slab takes ONE scatter of the live
    pairs (subs[i, a, b] = A[J_i[b], J_i[a]]; pair positions are
    pattern-only host symbolics, cached across generates), then the
    vmapped Gauss-Jordan solve.  The reference fills and solves these
    blocks on device for any pattern
    (common/cuda_hip/preconditioner/isai_kernels.cpp)."""
    from ..ops.gauss_jordan import batched_solve
    eye = jnp.broadcast_to(jnp.eye(S, dtype=avals.dtype), (n, S, S))
    vals = jnp.where(hit, avals[loc], jnp.zeros((), avals.dtype))
    # identity-initialized slab: A hits overwrite their (a, b) slots;
    # kept non-hit pairs are exactly the valid diagonal slots whose
    # submatrix diagonal is structurally zero (clear the stale 1)
    subs = eye.reshape(n * S * S).at[dest].set(vals).reshape(n, S, S)
    rhs = jnp.zeros((n, S), avals.dtype).at[
        jnp.arange(n), dslot].set(1)
    return batched_solve(subs, rhs)


from ..utils.plancache import SingleSlotCache

_ISAI_SYM_CACHE = SingleSlotCache()     # key: mode


def _want_packed_fill(n, S, itemsize):
    """Route to the device-resident unstructured fill: accelerator
    backends above the dispatch-amortization size, slab within HBM
    budget (tests monkeypatch this to force/disable the path)."""
    return (jax.default_backend() != "cpu" and n >= 16384
            and n * S * S * itemsize <= (3 << 30)
            and n * S * S < (1 << 31))


def _isai_packed_symbolics(d, ptr, lens, S, prow, pcol):
    """Pattern-only pair symbolics for the device fill (host, cached):
    for entry e = slot a of row i and every slot b of the same row,
    dest = flat (i, a, b) and loc/hit = A's lookup of (J_i[b], J_i[a]).
    Ships LIVE pairs only: the device slab is identity-initialized; A
    hits overwrite, and valid DIAGONAL slots without an A hit write an
    explicit 0 (the dense fill leaves 0 there; identity would leave a
    stale 1) — non-hit off-diagonal slots are already 0.  Primary path
    is the native two-pointer merge (gt_isai_pairs, O(Σ_b (m + deg));
    the numpy fallback materializes the Σ m² pair list)."""
    n = d.shape[0]
    nnzp = prow.shape[0]
    a_slot = np.arange(nnzp) - ptr[prow]
    from ..native import isai_pairs_native
    nat = isai_pairs_native(S, d.row_ptrs(),
                            np.ascontiguousarray(d.col_idx, np.int64),
                            ptr, np.ascontiguousarray(pcol, np.int64))
    if nat is not None:
        dest, loc, hit = nat
    else:
        cnt = lens[prow]
        pair_a = np.repeat(np.arange(nnzp), cnt)
        total = int(cnt.sum())
        b_local = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        row_of = prow[pair_a]
        ja = pcol[pair_a]
        jb = pcol[ptr[row_of] + b_local]
        akeys = d.row_idx.astype(np.int64) * n + d.col_idx
        qkeys = jb * n + ja
        loc = np.minimum(np.searchsorted(akeys, qkeys), d.nnz - 1)
        hit = akeys[loc] == qkeys
        dest = (row_of * S + a_slot[pair_a]) * S + b_local
        diag_miss = (a_slot[pair_a] == b_local) & ~hit
        keep = hit | diag_miss
        dest, loc, hit = dest[keep], loc[keep], hit[keep]
    # per-row rhs position of the pattern's diagonal entry
    on_diag = pcol == prow
    dslot = np.zeros(n, np.int64)
    dslot[prow[on_diag]] = a_slot[on_diag]
    return dict(dest=dest, loc=loc, hit=hit,
                dslot=dslot, a_slot=a_slot, nnzp=nnzp)


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

    # diagonal-structured fast path: device-resident block fill from
    # the DIA slab (no host (n, S, S) materialization, no transfer)
    dia = _isai_fill_dia(d, prow, pcol, nnzp)
    if dia is not None:
        from ..ops.gauss_jordan import batched_solve
        subs_d, rhs_d, offs_pat = dia
        sols = np.asarray(batched_solve(subs_d, rhs_d))    # (n, S)
        slot = np.searchsorted(offs_pat, pcol - prow)
        m_data = MatrixData((n, n), prow, pcol,
                            sols[prow, slot].astype(dtype))
        return Csr.from_data(m_data.canonical(), strategy="automatical")

    # unstructured device path: host pattern symbolics (cached on the
    # pattern+A-pattern digest; device index arrays cached too, so a
    # same-pattern regenerate ships only A's values) + one device
    # scatter into an identity slab + the batched solve.  Budget: the
    # (n, S, S) slab must fit comfortably in HBM.
    if _want_packed_fill(n, S, np.dtype(dtype).itemsize):
        from jax import dtypes as _dtypes
        from ..utils import stagetimer
        from ..utils.plancache import pattern_digest
        dig = pattern_digest(prow, pcol, d.row_idx, d.col_idx,
                             ints=(n, S, nnzp, d.nnz))
        sym = _ISAI_SYM_CACHE.get(mode, dig)
        if sym is _ISAI_SYM_CACHE.MISS:
            sym = _isai_packed_symbolics(d, ptr, lens, S, prow, pcol)
            # msel: per-pattern-entry flat (row, slot) position — the
            # result gather runs ON DEVICE so only nnzp values come
            # back over the host link, not the (n, S) slab
            sym["msel"] = (prow * S + sym["a_slot"]).astype(np.int32)
            with stagetimer.stage("transfer"):
                sym["dev"] = stagetimer.sync(tuple(
                    jnp.asarray(sym[k].astype(np.int32) if k != "hit"
                                else sym[k])
                    for k in ("dest", "loc", "hit", "dslot", "msel")))
            _ISAI_SYM_CACHE.put(mode, dig, sym)
        cdtype = _dtypes.canonicalize_dtype(dtype)
        with stagetimer.stage("transfer"):
            avals = stagetimer.sync(
                jnp.asarray(d.values.astype(cdtype)))
        with stagetimer.stage("device"):
            dest_d, loc_d, hit_d, dslot_d, msel_d = sym["dev"]
            sols = _isai_packed_kernel(
                avals, dest_d, loc_d, hit_d, dslot_d, n=n, S=S)
            mv = stagetimer.sync(sols.reshape(-1)[msel_d])
        with stagetimer.stage("transfer"):
            mvals = np.asarray(mv)
        m_data = MatrixData((n, n), prow, pcol, mvals.astype(dtype))
        return Csr.from_data(m_data.canonical(), strategy="automatical")

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
