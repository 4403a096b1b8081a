"""Device-resident ParILUT/ParICT for general unstructured matrices.

The reference runs the whole ParILUT loop on the device for ANY sparsity
(``common/cuda_hip/factorization/par_ilut_{spgeam,select,filter,sweep}_
kernels.cpp``, driver ``core/factorization/par_ilut.cpp:262-350``) by
reallocating per iteration.  ``par_ilut_dia.py`` already keeps the loop
on-device for diagonal-structured matrices by fixing the *shape
universe* up front; this module is the same reformulation with the
**packed-slot layout** (``ops/spmv_packed.py``) as the fixed universe,
so it covers the unstructured FEM/graph class the packed SpMV kernel
was built for:

* The slot universe is the bounded symbolic closure of A's pattern
  (``level`` rounds of pattern(A) ∪ pattern(tril⊗triu), the ILU(level)
  fill pattern), split into row-major strictly-lower L slots and
  upper-with-diag U slots.  Values live as flat device vectors
  ``Vl (nl,)``, ``Vu (nu,)`` with uint8 activity masks; the pattern
  evolves as a mask, never as a reallocation.
* The restricted product (I+L)@U over the universe is contribution-pair
  expansion (native ``gt_ilut_pairs_rowmajor``, pairs k < min(i, j))
  evaluated as **two packed-slot SpMVs** instead of 7 ns/element scalar
  gathers: a one-nnz-per-row selection matrix ``S_L`` streams L values
  into the pair matrix's value layout, then the pair matrix ``M``
  (rows = output slots, cols = U slots, vals = the gathered L values)
  contracts against ``Vu`` — both at HBM-streaming rate through the
  existing ``pell_spmv`` kernel.  Wide rows are striped across several
  packed plans to stay inside the kernel's per-block vreg budget.
* ``u_jj`` per L slot is a third selection SpMV (``S_den``).
* candidates = A's pattern ∪ (the same pair product evaluated on the
  masks); select = the DIA path's sortable-bit top-k bisection
  (``par_ilut_dia._topk_mask``); filter = a mask update; sweeps = the
  ParILU fixed-point update ``l = (a - Σ_{k<min} l u)/u_jj``,
  ``u = a - Σ`` (the same Jacobi semantics as the reference's parallel
  GPU sweeps, which race benignly).

With the universe fixed, every outer iteration has identical shapes, so
the whole generate — candidates, select, filter, sweeps, ``iterations``
times — is ONE jitted ``fori_loop`` with zero host round-trips; the
host only runs the symbolic closure/pair planning before and the masked
compaction after.  Fill falling outside the level-``level`` universe is
dropped (it is the furthest-from-pattern, smallest-magnitude fill) —
the same bounded-universe trade the DIA path makes.

Falls back (returns None) when the closure or pair list exceeds the
budgets; ``ParIlut(algorithm=...)`` routes.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from .par_ilut_dia import _compact_device, _topk_mask

_WV_STRIPE = 160            # per-stripe vreg budget (kernel cap is 192;
                            # headroom for 8-slot window rounding)
_XW_CAP = 1 << 17           # pair-matrix x windows live in SLOT space
                            # (~row_nnz denser than column space)


# ---------------------------------------------------------------------------
# host symbolics: universe closure, pair enumeration, packed plans
# ---------------------------------------------------------------------------

def _closure(d, level, max_slots):
    """Row-major (rows, cols) of the bounded ILU(level) fill universe
    (diagonal always included), or None when even level 1 exceeds
    ``max_slots``."""
    import scipy.sparse as sp
    n = d.shape[0]
    P = sp.csr_matrix(
        (np.ones(d.nnz, np.float32),
         (d.row_idx.astype(np.int64), d.col_idx.astype(np.int64))),
        shape=(n, n))
    P = (P + sp.identity(n, np.float32, format="csr")).tocsr()
    P.data.fill(1.0)
    for lvl in range(level):
        L = sp.tril(P, -1, format="csr")
        U = sp.triu(P, 0, format="csr")
        F = L @ U
        nxt = (P + F).tocsr()
        nxt.data.fill(1.0)
        if nxt.nnz == P.nnz:
            break
        if nxt.nnz > max_slots:
            return None if lvl == 0 else _csr_pattern(P)
        P = nxt
    return _csr_pattern(P)


def _csr_pattern(P):
    P.sort_indices()
    rows = np.repeat(np.arange(P.shape[0], dtype=np.int64),
                     np.diff(P.indptr))
    return rows, P.indices.astype(np.int64)


def _pad_gs(layout, nb=4):
    """Pad a packed layout to an NB-multiple superblock count so
    ``pell_spmv_pallas`` never re-concatenates the (large, traced)
    value array inside the jitted solver loop."""
    meta = dict(layout["meta"])
    Gs = meta["Gs"]
    pad = (-Gs) % nb
    if pad == 0:
        return layout
    from ..ops.spmv_packed import _BLOCKS_PER_SB
    Wv = meta["Wv"]
    vals = np.concatenate(
        [layout["vals"],
         np.zeros((pad,) + layout["vals"].shape[1:],
                  layout["vals"].dtype)])
    idx = np.concatenate(
        [layout["idx"],
         np.zeros((pad,) + layout["idx"].shape[1:], layout["idx"].dtype)])
    qw = np.concatenate(
        [layout["qw"],
         np.zeros(pad * _BLOCKS_PER_SB * Wv, layout["qw"].dtype)])
    xbase = np.concatenate(
        [layout["xbase_row"], np.zeros(pad, layout["xbase_row"].dtype)])
    meta["Gs"] = Gs + pad
    return dict(vals=vals, idx=idx, qw=qw, xbase_row=xbase,
                meta=tuple(sorted(meta.items())))


class _CooView:
    """Minimal duck-typed MatrixData for plan_packed_layout."""

    def __init__(self, shape, rows, cols):
        self.shape = shape
        self.row_idx = rows
        self.col_idx = cols
        self.nnz = len(rows)


def _plan_selection(rows, cols, shape, max_tail=0.02):
    """Packed plan for a ≤1-nnz-per-row selection matrix (vals = 1)."""
    from ..ops.spmv_packed import plan_packed_layout
    layout, tail, stats = plan_packed_layout(
        _CooView(shape, rows, cols), np.ones(len(rows), np.float32),
        xw_cap=_XW_CAP)
    if layout is None or stats["tail_nnz"] > max_tail * max(len(rows), 1):
        return None
    layout = _pad_gs(layout)
    tr, tc, _ = tail
    return dict(layout=layout, tail_rows=tr.astype(np.int32),
                tail_cols=tc.astype(np.int32))


def _plan_pairs(pl, pu, po, n_out, n_in, max_pad=8.0, max_tail=0.05):
    """Stripe the (po, pu)-sorted pair list into packed plans.

    Each stripe is a packed layout of the pair matrix (rows = output
    slots, cols = pu) whose values are recovered pair ids, plus the
    matching selection plan gathering ``Vl[pl]`` into that layout's
    value order.  Returns (stripes, tail) or None; tail pairs (window
    or budget spills) fall back to gather/segment-sum on device."""
    from ..ops.spmv_packed import plan_packed_layout
    npairs = len(po)
    if npairs == 0:
        return [], (np.zeros(0, np.int32),) * 3
    # rank of each pair within its output slot (pairs are po-sorted)
    new_run = np.ones(npairs, bool)
    new_run[1:] = po[1:] != po[:-1]
    run_start = np.flatnonzero(new_run)
    rank = np.arange(npairs) - np.repeat(run_start, np.diff(
        np.append(run_start, npairs)))
    # stripes sized so per-128-row-block slot demand fits the vreg cap
    blk_of = po.astype(np.int64) // 128
    per_blk = np.bincount(blk_of, minlength=(n_out + 127) // 128)
    n_stripes = max(1, int(np.ceil(per_blk.max() / (8.0 * _WV_STRIPE))))
    stripes = []
    tails = []
    for s in range(n_stripes):
        m = (rank % n_stripes) == s
        spl, spu, spo = pl[m], pu[m], po[m]
        ids = np.arange(1, len(spo) + 1, dtype=np.float64)
        layout, tail, stats = plan_packed_layout(
            _CooView((n_out, n_in), spo.astype(np.int64),
                     spu.astype(np.int64)), ids,
            xw_cap=_XW_CAP, max_pad=max_pad, max_tail=max_tail)
        if layout is None:
            return None
        layout = _pad_gs(layout)
        # recover the pair id at each layout slot (0 = padding)
        lp = layout["vals"].astype(np.int64).ravel() - 1
        live = np.flatnonzero(lp >= 0)
        sel = _plan_selection(live, spl[lp[live]].astype(np.int64),
                              (lp.size, None))
        if sel is None:
            return None
        vals_shape = layout["vals"].shape
        meta = dict(layout["meta"])
        meta["m"] = int(n_in)
        meta["xpad_rows"] = max(meta["xpad_rows"], -(-int(n_in) // 128))
        stripes.append(dict(
            m_idx=layout["idx"], m_qw=layout["qw"],
            m_xbase=layout["xbase_row"],
            m_meta=tuple(sorted(meta.items())),
            vals_shape=vals_shape, sel=sel))
        t_keep = tail[2].astype(np.int64) - 1
        tails.append((spl[t_keep], spu[t_keep], spo[t_keep]))
    tl = np.concatenate([t[0] for t in tails]).astype(np.int32)
    tu = np.concatenate([t[1] for t in tails]).astype(np.int32)
    to = np.concatenate([t[2] for t in tails]).astype(np.int32)
    return stripes, (tl, tu, to)


def _sel_meta(sel, m):
    """Selection plan meta with the x-vector length filled in (the
    padded x must cover the whole vector even when the last windows
    don't reach it)."""
    meta = dict(sel["layout"]["meta"])
    meta["m"] = int(m)
    meta["xpad_rows"] = max(meta["xpad_rows"], -(-int(m) // 128))
    return tuple(sorted(meta.items()))


def plan_packed_ilut(d, *, level=2, max_slots=40_000_000,
                     max_pairs=600_000_000):
    """Host-side symbolic plan for the packed device ParILUT, or None
    when the matrix/closure doesn't fit the budgets.  ``d`` must be
    canonical MatrixData."""
    n, m = d.shape
    if n != m or d.nnz == 0 or n < 2:
        return None
    from ..native import ilut_pairs_rowmajor_native
    univ = _closure(d, level, max_slots)
    if univ is None:
        return None
    rows, cols = univ
    low = rows > cols
    lr, lc = rows[low], cols[low]
    ur, uc = rows[~low], cols[~low]
    pairs = ilut_pairs_rowmajor_native(n, lr, lc, ur, uc, cap=max_pairs)
    if pairs is None:
        return None
    nl, nu = len(lr), len(ur)
    planned = _plan_pairs(*pairs, n_out=nl + nu, n_in=nu)
    if planned is None:
        return None
    stripes, tail = planned
    # u_jj per L slot: selection S_den over Vu
    diag_pos = np.full(n, -1, np.int64)
    ud = ur == uc
    diag_pos[ur[ud]] = np.flatnonzero(ud)
    sden = _plan_selection(np.arange(nl, dtype=np.int64),
                           diag_pos[lc], (nl, None))
    if sden is None:
        return None
    # A's values/pattern scattered onto the universe slots
    akey = d.row_idx.astype(np.int64) * n + d.col_idx
    lpos = np.searchsorted(akey, lr * n + lc)
    lpos_c = np.minimum(lpos, akey.size - 1)
    lhit = akey[lpos_c] == lr * n + lc
    upos = np.searchsorted(akey, ur * n + uc)
    upos_c = np.minimum(upos, akey.size - 1)
    uhit = akey[upos_c] == ur * n + uc
    return dict(n=n, nl=nl, nu=nu, lr=lr, lc=lc, ur=ur, uc=uc,
                stripes=stripes, tail=tail, sden=sden,
                diag_slots=np.flatnonzero(ud).astype(np.int64),
                al_src=(lpos_c, lhit), au_src=(upos_c, uhit))


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _pell(vals, idx, qw, xbase, meta, x):
    from ..ops.registry import lookup
    return lookup("pell_spmv")(vals, idx, qw, xbase, meta, x[:, None])[:, 0]


def _apply_selection(arrs, meta, x):
    """y[i] = x[col[i]] for a ≤1-nnz-per-row selection plan."""
    import jax.numpy as jnp
    y = _pell(arrs["vals"], arrs["idx"], arrs["qw"], arrs["xbase"],
              meta, x)
    if arrs["tail_rows"].shape[0]:
        y = y.at[arrs["tail_rows"]].set(x[arrs["tail_cols"]])
    return y.astype(x.dtype) if y.dtype != x.dtype else y


def _product_packed(Vl, Vu, arrs, meta):
    """contrib[o] = sum_{k<min(i,j)} l_ik u_kj over the universe, as
    stacked packed-SpMV stripes + a gather tail.  Returns (nl+nu,)."""
    import jax.numpy as jnp
    nl, nu, stripe_meta, sden_meta = meta
    y = jnp.zeros((nl + nu,), Vu.dtype)
    for st_arr, st_meta in zip(arrs["stripes"], stripe_meta):
        sel_meta, m_meta, vals_shape = st_meta
        g = _apply_selection(st_arr["sel"], sel_meta, Vl)
        mvals = g.reshape(vals_shape)
        y = y + _pell(mvals, st_arr["m_idx"], st_arr["m_qw"],
                      st_arr["m_xbase"], m_meta, Vu).astype(Vu.dtype)
    tl, tu, to = arrs["tail"]
    if tl.shape[0]:
        y = y.at[to].add(Vl[tl] * Vu[tu])
    return y


@partial(jax.jit, static_argnames=("meta", "iterations", "sweeps",
                                   "keep_l", "keep_u"))
def _run_packed(arrs, Al, Au, Aml, Amu, meta, iterations, sweeps,
                keep_l, keep_u):
    """The whole ParILUT loop on device: init sweeps + ``iterations`` x
    (candidates -> select -> filter -> sweeps).  Returns
    (Vl, Vu, Ml, Mu)."""
    import jax.numpy as jnp
    from jax import lax
    nl, nu, _, sden_meta = meta
    one = jnp.ones((), Al.dtype)

    def rden(Vu):
        den = _apply_selection(arrs["sden"], sden_meta, Vu)
        return jnp.where(den == 0, one, one / jnp.where(den == 0, one,
                                                        den))

    def update(Vl, Vu, Ml, Mu):
        """One fixed-point evaluation on the active pattern."""
        c = _product_packed(Vl, Vu, arrs, meta)
        r = rden(Vu)
        new_l = (Al - c[:nl]) * r
        new_u = Au - c[nl:]
        return (jnp.where(Ml.astype(bool), new_l, jnp.zeros((), Al.dtype)),
                jnp.where(Mu.astype(bool), new_u, jnp.zeros((), Al.dtype)))

    def sweep_block(Vl, Vu, Ml, Mu, count):
        for _ in range(count):
            Vl, Vu = update(Vl, Vu, Ml, Mu)
        return Vl, Vu

    def iteration(_, carry):
        Vl, Vu, Ml, Mu = carry
        # 1+2. product + add_candidates + Jacobi seed on the union
        c = _product_packed(Vl, Vu, arrs, meta)
        cm = _product_packed(Ml.astype(Vl.dtype), Mu.astype(Vu.dtype),
                             arrs, meta)
        cand_l = (Aml | Ml | (jnp.real(cm[:nl]) > 0.5)).astype(jnp.uint8)
        cand_u = (Amu | Mu | (jnp.real(cm[nl:]) > 0.5)).astype(jnp.uint8)
        r = rden(Vu)
        V2l = jnp.where(cand_l.astype(bool), (Al - c[:nl]) * r,
                        jnp.zeros((), Al.dtype))
        V2u = jnp.where(cand_u.astype(bool), Au - c[nl:],
                        jnp.zeros((), Al.dtype))
        # 3+4. select + filter: top-k by magnitude per factor (diag
        # pinned so it is always kept within budget)
        mag_u = jnp.abs(V2u).at[arrs["diag_slots"]].set(jnp.inf)
        M3l = _topk_mask(jnp.abs(V2l), cand_l, keep_l)
        M3u = _topk_mask(mag_u, cand_u, keep_u).at[
            arrs["diag_slots"]].set(1)
        V3l = V2l * M3l
        V3u = V2u * M3u
        # 5. sweeps on the filtered pattern
        V3l, V3u = sweep_block(V3l, V3u, M3l, M3u, sweeps)
        return V3l, V3u, M3l, M3u

    # scaled init (l0 = a_ij/a_jj) on A's pattern, then 3 init sweeps
    Ml0 = Aml
    Mu0 = Amu.at[arrs["diag_slots"]].set(1)
    r0 = rden(Au * Amu)
    Vl0 = Al * r0 * Ml0
    Vu0 = Au * Mu0
    Vl0, Vu0 = sweep_block(Vl0, Vu0, Ml0, Mu0, 3)
    return lax.fori_loop(0, iterations, iteration,
                         (Vl0, Vu0, Ml0, Mu0))


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def _device_arrs(plan, cdtype):
    """Ship the static plan arrays + build the static meta tuple."""
    import jax.numpy as jnp

    def sel_arrs(sel):
        lo = sel["layout"]
        return dict(vals=jnp.asarray(lo["vals"].astype(np.float32)),
                    idx=jnp.asarray(lo["idx"]),
                    qw=jnp.asarray(lo["qw"]),
                    xbase=jnp.asarray(lo["xbase_row"]),
                    tail_rows=jnp.asarray(sel["tail_rows"]),
                    tail_cols=jnp.asarray(sel["tail_cols"]))

    stripes = []
    stripe_meta = []
    for st in plan["stripes"]:
        stripes.append(dict(
            m_idx=jnp.asarray(st["m_idx"]), m_qw=jnp.asarray(st["m_qw"]),
            m_xbase=jnp.asarray(st["m_xbase"]),
            sel=sel_arrs(st["sel"])))
        stripe_meta.append((_sel_meta(st["sel"], plan["nl"]),
                            st["m_meta"], st["vals_shape"]))
    tl, tu, to = plan["tail"]
    arrs = dict(stripes=tuple(stripes),
                tail=(jnp.asarray(tl), jnp.asarray(tu), jnp.asarray(to)),
                sden=sel_arrs(plan["sden"]),
                diag_slots=jnp.asarray(plan["diag_slots"]))
    meta = (plan["nl"], plan["nu"], tuple(stripe_meta),
            _sel_meta(plan["sden"], plan["nu"]))
    return arrs, meta


def generate_packed(d, iterations, fill_in_limit, sweeps, *, level=2,
                    plan=None):
    """Run the device-resident packed ParILUT; returns
    (lr, lc, lv, ur, uc, uv) split arrays (L strictly lower) or None
    when the pattern/budgets reject."""
    if plan is None:
        plan = plan_packed_ilut(d, level=level)
    if plan is None:
        return None
    import jax.numpy as jnp
    from jax import dtypes
    cdtype = dtypes.canonicalize_dtype(d.values.dtype)
    n, nl, nu = plan["n"], plan["nl"], plan["nu"]
    lpos, lhit = plan["al_src"]
    upos, uhit = plan["au_src"]
    vals = d.values.astype(cdtype)
    Al = np.where(lhit, vals[lpos], 0)
    Au = np.where(uhit, vals[upos], 0)
    Aml = (lhit & (Al != 0)).astype(np.uint8)
    Amu = (uhit & (Au != 0)).astype(np.uint8)
    keep_l = int(np.ceil(fill_in_limit * max(int(Aml.sum()), 1)))
    nnz_u0 = int(Amu.sum())
    nnz_u0 += n - int(Amu[plan["diag_slots"]].sum())
    keep_u = int(np.ceil(fill_in_limit * max(nnz_u0, 1)))

    arrs, meta = _device_arrs(plan, cdtype)
    Vl, Vu, Ml, Mu = _run_packed(
        arrs, jnp.asarray(Al), jnp.asarray(Au), jnp.asarray(Aml),
        jnp.asarray(Amu), meta, int(iterations), int(sweeps),
        keep_l, keep_u)
    kml = max(keep_l, int(Aml.sum()))          # iterations=0 keeps A's
    kmu = max(keep_u + n, nnz_u0)              # pattern whole
    lv_d, lslot, lcount = _compact_device(Vl, Ml, kml)
    uv_d, uslot, ucount = _compact_device(Vu, Mu, kmu)
    nkl, nku = int(lcount), int(ucount)
    lsl = np.asarray(lslot)[:nkl]
    usl = np.asarray(uslot)[:nku]
    return (plan["lr"][lsl], plan["lc"][lsl], np.asarray(lv_d)[:nkl],
            plan["ur"][usl], plan["uc"][usl], np.asarray(uv_d)[:nku])
