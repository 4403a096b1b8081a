"""Chunk-ELL Pallas SpMV — fast path for general (unstructured) CSR.

Second-generation TPU answer to Ginkgo's load-balanced CSR SpMV
(``common/cuda_hip/matrix/csr_kernels.template.cpp:251-472``).  The
windowed-ELL kernel (`spmv_windowed.py`) pays an H-way gather/select
per index vreg; here the layout guarantees every index vreg reads from
exactly ONE 128-wide x chunk, so the inner loop is

    row   = x_window[chunk_id[v]]          # (1, 128) dynamic sublane read
    gathered = dynamic_gather(broadcast(row), lanes[v])   # 1 lane gather
    acc  += vals[v] * gathered

Layout (host, vectorized numpy):
  * 128 consecutive rows form a *block* (rows across lanes); 8 blocks a
    *superblock* (1024 rows) sharing one contiguous x window that is
    DMA'd to VMEM;
  * within a block, each row's entries are grouped by x *chunk*
    (``(col - window_base) // 128``); per (block, chunk) the j-th entry
    of each row lands in slot ``slot_base[block, chunk] + j``;
  * 8 consecutive slots form one (8, 128) vreg whose chunk id is static
    (scalar-prefetched), so the kernel never decodes chunk ids on-chip;
    stored per-entry indices are just the lane (``col & 127``);
  * per-block vreg counts are padded to a static ``Wv``; overflow
    entries and window violations spill to a COO tail handled by the
    classical kernel (same escape hatch as the banded strategy).

Cost: ~6 vector ops per 1024 entries (vs ~8 + 3H for windowed-ELL) at
the price of chunk-alignment padding (rows whose entries straddle a
chunk boundary consume slots in both chunks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..registry import register

LANES = 128
_ROWS_PER_BLOCK = 128
_BLOCKS_PER_SB = 8
_SB_ROWS = _ROWS_PER_BLOCK * _BLOCKS_PER_SB
_XW_CAP = 16384
_WV_CAP = 128              # max vregs (of 8 slots) per 128-row block


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def plan_chunked_layout(d, values_np, *, wv_cap=_WV_CAP, xw_cap=_XW_CAP):
    """Build the chunk-ELL layout from canonical MatrixData.

    Returns (layout, tail, stats); layout holds numpy arrays
    ``vals (Gs, 8*Wv, 8, 128)``, ``lanes`` (same shape, int16), ``qid
    (Gs*8*Wv,) int32`` (window-relative chunk row per vreg),
    ``xbase_row (Gs,) int32`` and static ``meta``.  ``tail`` is
    (rows, cols, vals) of spilled entries.
    """
    n, m = d.shape
    nnz = d.nnz
    if n == 0 or nnz == 0:
        return None, None, {"ell_nnz": 0, "tail_nnz": 0,
                            "pad_ratio": np.inf}
    rows = d.row_idx.astype(np.int64)
    cols = d.col_idx.astype(np.int64)
    vals = values_np

    n_pad = -(-n // _SB_ROWS) * _SB_ROWS
    Gs = n_pad // _SB_ROWS
    n_blk = n_pad // _ROWS_PER_BLOCK
    sb = rows // _SB_ROWS
    blk = rows // _ROWS_PER_BLOCK

    # 1. per-superblock x window
    mincol = np.full(Gs, np.int64(1) << 60)
    maxcol = np.full(Gs, -1, np.int64)
    np.minimum.at(mincol, sb, cols)
    np.maximum.at(maxcol, sb, cols)
    empty_sb = maxcol < 0
    mincol[empty_sb] = 0
    maxcol[empty_sb] = 0
    xbase = (mincol // LANES) * LANES
    span = maxcol - xbase + 1
    XW = max(min(_pow2ceil(int(span.max())), xw_cap), LANES)
    spill = cols - xbase[sb] >= XW
    keep = ~spill

    crel = np.where(keep, cols - xbase[sb], 0)
    chunk = crel >> 7
    lane = crel & 127
    C = XW // LANES

    # 2. within-(row, chunk) position j (entries are in canonical
    #    row-major, column-sorted order, so (row, chunk) runs are
    #    contiguous; spilled entries must not advance j)
    key = np.where(keep, rows * C + chunk, -1)
    new_run = np.ones(nnz, bool)
    new_run[1:] = key[1:] != key[:-1]
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    j = np.arange(nnz) - run_start[run_id]
    # spilled entries inside a run create gaps; renumber survivors only
    j = j - np.where(keep, 0, 0)  # runs with key=-1 are isolated; keep j
    # (a spilled entry splits its own run because its key is -1, so
    #  surviving runs are contiguous and j is correct for them)

    # 3. per-(block, chunk) slot counts, rounded to vregs of 8
    gid = blk * C + chunk
    K = np.zeros(n_blk * C, np.int64)
    np.maximum.at(K, gid[keep], j[keep] + 1)
    Kr = -(-K // 8) * 8
    # slot bases: per block, exclusive cumsum over its C chunks
    Kr2 = Kr.reshape(n_blk, C)
    base2 = np.zeros_like(Kr2)
    np.cumsum(Kr2[:, :-1], axis=1, out=base2[:, 1:])
    slot_base = base2.reshape(-1)
    V_b = Kr2.sum(axis=1) // 8
    Wv = int(min(max(int(V_b.max()), 1), wv_cap))

    s = slot_base[gid] + j
    spill |= keep & (s >= Wv * 8)
    keep = ~spill

    # 4. per-vreg chunk ids (vreg v of block b covers slots 8v..8v+7)
    qid = np.zeros((n_blk, Wv), np.int32)
    nv = np.minimum(Kr2 // 8, Wv)                     # vregs per group
    first_v = np.minimum(base2 // 8, Wv)
    bidx = np.repeat(np.arange(n_blk), C)
    cidx = np.tile(np.arange(C), n_blk)
    cnt = np.minimum(nv.reshape(-1),
                     np.maximum(Wv - first_v.reshape(-1), 0))
    rep_b = np.repeat(bidx, cnt)
    rep_c = np.repeat(cidx, cnt)
    starts = np.repeat(first_v.reshape(-1), cnt)
    within = np.arange(cnt.sum()) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    qid[rep_b, starts + within] = rep_c

    # 5. final dense arrays
    vals_arr = np.zeros((n_blk, Wv * 8, _ROWS_PER_BLOCK),
                        values_np.dtype)
    lane_arr = np.zeros((n_blk, Wv * 8, _ROWS_PER_BLOCK), np.int16)
    lr = rows & 127
    vals_arr[blk[keep], s[keep], lr[keep]] = vals[keep]
    lane_arr[blk[keep], s[keep], lr[keep]] = lane[keep]
    # (n_blk, Wv*8, 128) -> (Gs, 8 blocks, Wv, 8 sub, 128) ->
    # axis-1 enumerates (b, v): [sb, b*Wv + v, sub, lane]
    vals_arr = vals_arr.reshape(Gs, _BLOCKS_PER_SB, Wv, 8, LANES)
    lane_arr = lane_arr.reshape(Gs, _BLOCKS_PER_SB, Wv, 8, LANES)
    vals_arr = np.ascontiguousarray(
        vals_arr.reshape(Gs, _BLOCKS_PER_SB * Wv, 8, LANES))
    lane_arr = np.ascontiguousarray(
        lane_arr.reshape(Gs, _BLOCKS_PER_SB * Wv, 8, LANES))
    qid_arr = np.ascontiguousarray(qid.reshape(-1))
    xbase_row = (xbase // LANES).astype(np.int32)
    xpad_rows = int(xbase_row.max()) + XW // LANES

    ell_nnz = int(keep.sum())
    tail = (rows[spill], cols[spill], vals[spill])
    stats = {"ell_nnz": ell_nnz, "tail_nnz": int(spill.sum()),
             "pad_ratio": Gs * _BLOCKS_PER_SB * Wv * 8 * LANES
             / max(ell_nnz, 1), "Wv": Wv, "XW": XW}
    meta = dict(n=n, m=m, Gs=Gs, Wv=Wv, XW=XW, xpad_rows=xpad_rows)
    layout = dict(vals=vals_arr, lanes=lane_arr, qid=qid_arr,
                  xbase_row=xbase_row, meta=tuple(sorted(meta.items())))
    return layout, tail, stats


def _pad_x(b_col, meta):
    m, rows = meta["m"], meta["xpad_rows"]
    return jnp.pad(b_col, (0, rows * LANES - m)).reshape(rows, LANES)


@register("cell_spmv", "reference")
def cell_spmv_reference(vals, lanes, qid, xbase_row, meta_items, b):
    """Oracle: same arrays, plain jnp gather (correctness only)."""
    meta = dict(meta_items)
    Gs, Wv, n = meta["Gs"], meta["Wv"], meta["n"]
    k = b.shape[1]
    # absolute column of a slot = (xbase + qid*128)*1 + lane
    qid2 = qid.reshape(Gs, _BLOCKS_PER_SB * Wv)
    outs = []
    for kk in range(k):
        xp = _pad_x(b[:, kk], meta).reshape(-1)
        col_abs = ((xbase_row[:, None].astype(jnp.int32)
                    + qid2) * LANES)[:, :, None, None] \
            + lanes.astype(jnp.int32)
        g = xp[col_abs]                                # (Gs, 8*Wv, 8, 128)
        prod = vals.astype(b.dtype) * g
        p = prod.reshape(Gs, _BLOCKS_PER_SB, Wv, 8, LANES).sum(
            axis=(2, 3))
        outs.append(p.reshape(Gs * _SB_ROWS)[:n])
    return jnp.stack(outs, axis=1)


def _cell_kernel(xbase_ref, qid_ref, xp_ref, vals_ref, lane_ref, out_ref,
                 vbuf, lbuf, xbuf, ybuf, vsem, lsem, xsem, ysem,
                 *, Gs, Wv, XWr, NB, acc_dtype):
    """One grid step; NB-deep manual DMA pipeline over superblocks."""

    def v_dma(t, j):
        return pltpu.make_async_copy(vals_ref.at[t], vbuf.at[j],
                                     vsem.at[j])

    def l_dma(t, j):
        return pltpu.make_async_copy(lane_ref.at[t], lbuf.at[j],
                                     lsem.at[j])

    def x_dma(t, j):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(xbase_ref[t], XWr), :], xbuf.at[j],
            xsem.at[j])

    def y_dma(t, j):
        return pltpu.make_async_copy(ybuf.at[j], out_ref.at[t],
                                     ysem.at[j])

    for j in range(NB):
        v_dma(j, j).start()
        l_dma(j, j).start()
        x_dma(j, j).start()

    def outer(o, _):
        for j in range(NB):
            t = o * NB + j
            v_dma(t, j).wait()
            l_dma(t, j).wait()
            x_dma(t, j).wait()

            @pl.when(o > 0)
            def _():
                y_dma(t - NB, j).wait()

            for b in range(_BLOCKS_PER_SB):
                acc = jnp.zeros((8, LANES), acc_dtype)
                for v in range(Wv):
                    q = qid_ref[(t * _BLOCKS_PER_SB + b) * Wv + v]
                    row = xbuf[j, pl.ds(q, 1), :]
                    tb = jnp.broadcast_to(row, (8, LANES))
                    lane = lbuf[j, b * Wv + v].astype(jnp.int32)
                    g = jnp.take_along_axis(tb, lane, axis=1)
                    acc = acc + vbuf[j, b * Wv + v].astype(acc_dtype) * g
                ybuf[j, b, :] = jnp.sum(acc, axis=0).astype(ybuf.dtype)
            y_dma(t, j).start()

            @pl.when(t + NB < Gs)
            def _():
                v_dma(t + NB, j).start()
                l_dma(t + NB, j).start()
                x_dma(t + NB, j).start()
        return 0

    jax.lax.fori_loop(0, Gs // NB, outer, 0)
    for j in range(NB):
        y_dma(Gs - NB + j, j).wait()


@functools.lru_cache(maxsize=64)
def _build_cell_call(meta_items, dtype_name, interpret, NB=4):
    meta = dict(meta_items)
    Gs, Wv, XW = meta["Gs"], meta["Wv"], meta["XW"]
    NB = max(1, min(NB, Gs))
    Gs_pad = -(-Gs // NB) * NB
    dtype = jnp.dtype(dtype_name)
    XWr = XW // LANES
    kernel = functools.partial(
        _cell_kernel, Gs=Gs_pad, Wv=Wv, XWr=XWr, NB=NB,
        acc_dtype=jnp.float32)
    slots = _BLOCKS_PER_SB * Wv
    vmem = NB * (slots * 8 * LANES * (dtype.itemsize + 2)
                 + XWr * LANES * dtype.itemsize) + (2 << 20)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,        # xbase_row, qid
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((NB, slots, 8, LANES), dtype),
                        pltpu.VMEM((NB, slots, 8, LANES), jnp.int16),
                        pltpu.VMEM((NB, XWr, LANES), dtype),
                        pltpu.VMEM((NB, _BLOCKS_PER_SB, LANES), dtype),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Gs_pad, _BLOCKS_PER_SB, LANES),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 << 20, vmem * 2)),
        interpret=bool(interpret),
    ), Gs_pad


def cell_spmv_pallas(vals, lanes, qid, xbase_row, meta_items, b, *,
                     interpret=False):
    meta = dict(meta_items)
    n, Gs, Wv = meta["n"], meta["Gs"], meta["Wv"]
    call, Gs_pad = _build_cell_call(meta_items, jnp.dtype(b.dtype).name,
                                    interpret)
    if Gs_pad != Gs:
        pad = Gs_pad - Gs
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad,) + vals.shape[1:], vals.dtype)])
        lanes = jnp.concatenate(
            [lanes, jnp.zeros((pad,) + lanes.shape[1:], lanes.dtype)])
        qid = jnp.concatenate(
            [qid, jnp.zeros((pad * _BLOCKS_PER_SB * Wv,), qid.dtype)])
        xbase_row = jnp.concatenate(
            [xbase_row, jnp.zeros((pad,), xbase_row.dtype)])
    outs = []
    for kk in range(b.shape[1]):
        xp = _pad_x(b[:, kk], meta)
        y = call(xbase_row, qid, xp, vals, lanes)
        outs.append(y.reshape(Gs_pad * _SB_ROWS)[:n])
    return jnp.stack(outs, axis=1)


@register("cell_spmv", "tpu")
def cell_spmv_tpu(vals, lanes, qid, xbase_row, meta_items, b):
    ok = (jnp.dtype(b.dtype) == jnp.float32
          and jnp.dtype(vals.dtype) == jnp.float32)
    if not ok:
        from ..log.logger import PERFORMANCE_FALLBACK, dispatch
        dispatch(PERFORMANCE_FALLBACK, kernel="cell_spmv",
                 reason="non-f32 dtype (Pallas path is f32-only)")
        return cell_spmv_reference(vals, lanes, qid, xbase_row,
                                   meta_items, b)
    return cell_spmv_pallas(vals, lanes, qid, xbase_row, meta_items, b)
