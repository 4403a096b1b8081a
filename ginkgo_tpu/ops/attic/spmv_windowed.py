"""Windowed-ELL Pallas SpMV — the TPU path for general (unstructured) CSR.

The TPU answer to Ginkgo's load-balanced / merge-path CSR SpMV kernels
(``common/cuda_hip/matrix/csr_kernels.template.cpp:251-472``) and the
SELL-C-sigma family (``include/ginkgo/core/matrix/sellp.hpp``): XLA's
general gather costs ~7 ns/element (scalar lowering), so the gather must
run on-chip against a VMEM-resident x window.

Layout (build-time, host):
  * rows grouped in blocks of 128 (rows across *lanes*), 8 blocks per
    superblock (1024 rows);
  * ELL slots: the j-th nonzero of each row; 8 consecutive slots form a
    vreg group (slots across *sublanes*) -> one (8, 128) index block;
  * per superblock, a contiguous x window [xbase, xbase+XW) is DMA'd to
    VMEM; column indices are stored window-relative as int16;
  * per vreg group, a precomputed chunk base q0 selects an (8, 128)
    window slice; per-sublane (= per-slot) chunk offsets are recovered
    on-chip (min-reduce), so each gather is: one sublane
    ``dynamic_gather`` to pick each slot's 128-wide chunk, one lane
    ``dynamic_gather`` within the chunk, and an H-way select
    (H = static max per-slot chunk spread, usually 2).

Entries that violate the static bounds (slot >= w, window overflow, vreg
chunk spread > 8, slot spread > H) spill to a COO tail handled by the
classical kernel — the same escape hatch the banded strategy uses.

Row reduction is free: products accumulate in-register over slots; the
only cross-lane op is the final 8-sublane sum per block.
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
_XW_CAP = 16384            # int16 window-relative columns need XW < 32768
_W_CAP = 64                # max ELL slots per row


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def plan_windowed_layout(d, values_np, *, w_cap=_W_CAP, xw_cap=_XW_CAP,
                         h_quantile=0.995):
    """Build the windowed-ELL layout from canonical MatrixData.

    Returns (layout, tail, stats) or (None, None, stats) when the matrix
    has no rows.  ``layout`` holds numpy arrays: vals (Gs, w, 8, 128),
    c16 (Gs, w, 8, 128) int16, q0 (Gs, 8, w/8) int32, xbase_row (Gs,)
    int32, and ``meta`` (static ints).  ``tail`` is (rows, cols, vals)
    of spilled entries (possibly empty).
    """
    n, m = d.shape
    nnz = d.nnz
    if n == 0 or nnz == 0:
        return None, None, {"ell_nnz": 0, "tail_nnz": 0, "pad_ratio": np.inf}
    rows = d.row_idx.astype(np.int64)
    cols = d.col_idx.astype(np.int64)
    vals = values_np
    row_ptr = d.row_ptrs()
    degrees = row_ptr[1:] - row_ptr[:-1]

    # 1. slot assignment (j-th entry of each row); degree overflow -> tail
    slot = np.arange(nnz, dtype=np.int64) - row_ptr[rows]
    w = min(-(-int(degrees.max()) // 8) * 8, w_cap)
    spill = slot >= w

    n_pad = -(-n // _SB_ROWS) * _SB_ROWS
    Gs = n_pad // _SB_ROWS
    sb = rows // _SB_ROWS

    # 2. per-superblock x window base + width
    keep = ~spill
    mincol = np.full(Gs, np.int64(1) << 60)
    maxcol = np.full(Gs, -1, np.int64)
    np.minimum.at(mincol, sb[keep], cols[keep])
    np.maximum.at(maxcol, sb[keep], cols[keep])
    empty_sb = maxcol < 0
    mincol[empty_sb] = 0
    maxcol[empty_sb] = 0
    xbase = (mincol // LANES) * LANES
    span = maxcol - xbase + 1
    XW = min(_pow2ceil(int(span.max())), xw_cap)
    XW = max(XW, 1024)                      # >= 8 chunks for the q0 slice
    spill |= keep & (cols - xbase[sb] >= XW)
    keep = ~spill

    crel = np.where(keep, cols - xbase[sb], 0)
    sub = crel >> 7

    # 3. per-vreg-group chunk base q0 (vreg = block of 128 rows x 8 slots)
    w8 = w // 8
    blk = rows // _ROWS_PER_BLOCK          # global 128-row block id
    grp = slot // 8                        # slot group id
    n_blk = n_pad // _ROWS_PER_BLOCK
    vreg_id = blk * w8 + grp
    n_vreg = n_blk * w8
    vmin = np.full(n_vreg, np.int64(1) << 60)
    np.minimum.at(vmin, vreg_id[keep], sub[keep])
    vmin[vmin >= (np.int64(1) << 60)] = 0
    q0 = np.minimum(vmin, XW // LANES - 8)
    spill |= keep & (sub - q0[vreg_id] > 7)
    keep = ~spill

    # 4. per-slot (sublane) chunk spread -> static H
    slot_id = blk * w + slot               # global (block, slot) id
    n_slot = n_blk * w
    smin = np.full(n_slot, np.int64(1) << 60)
    np.minimum.at(smin, slot_id[keep], sub[keep])
    spread = np.where(keep, sub - smin[slot_id], 0)
    if keep.any():
        hq = int(np.quantile(spread[keep], h_quantile)) + 1
    else:
        hq = 1
    H = 2 if hq <= 2 else (4 if hq <= 4 else 8)
    spill |= keep & (spread >= H)
    keep = ~spill

    # recompute per-slot mins over survivors (pads use these); empty slots
    # pad at their vreg's q0 so the kernel's min-reduce stays in range
    smin = np.full(n_slot, np.int64(1) << 60)
    np.minimum.at(smin, slot_id[keep], sub[keep])
    sid = np.arange(n_slot, dtype=np.int64)
    svreg = (sid // w) * w8 + (sid % w) // 8
    empty_slot = smin >= (np.int64(1) << 60)
    smin[empty_slot] = q0[svreg[empty_slot]]

    # 5. final arrays
    ell_val = np.zeros((n_blk * _ROWS_PER_BLOCK, w), values_np.dtype)
    ell_c16 = np.broadcast_to((smin * LANES).astype(np.int64).reshape(
        n_blk, w)[:, None, :], (n_blk, _ROWS_PER_BLOCK, w)).reshape(
            n_blk * _ROWS_PER_BLOCK, w).copy()
    ell_val[rows[keep], slot[keep]] = vals[keep]
    ell_c16[rows[keep], slot[keep]] = crel[keep]

    # (n_pad, w) -> (Gs, 8 blocks, 128 rows, w slots) -> (Gs, w, 8*?, ...)
    # target [sb, b*w8 + j, s, l] = slot 8j+s of row 1024*sb + 128*b + l
    ev = ell_val.reshape(Gs, _BLOCKS_PER_SB, _ROWS_PER_BLOCK, w8, 8)
    ec = ell_c16.reshape(Gs, _BLOCKS_PER_SB, _ROWS_PER_BLOCK, w8, 8)
    vals_arr = np.ascontiguousarray(
        ev.transpose(0, 1, 3, 4, 2).reshape(Gs, w, 8, LANES))
    c16_arr = np.ascontiguousarray(
        ec.transpose(0, 1, 3, 4, 2).reshape(Gs, w, 8, LANES)
    ).astype(np.int16)
    # flat 1-D: SMEM pads the last dim of multi-D scalar operands to 128
    q0_arr = np.ascontiguousarray(q0.reshape(-1)).astype(np.int32)
    xbase_row = (xbase // LANES).astype(np.int32)
    xpad_rows = int(xbase_row.max()) + XW // LANES

    ell_nnz = int(keep.sum())
    tail = (rows[spill], cols[spill], vals[spill])
    stats = {"ell_nnz": ell_nnz, "tail_nnz": int(spill.sum()),
             "pad_ratio": Gs * w * _SB_ROWS / max(ell_nnz, 1),
             "H": H, "w": w, "XW": XW}
    meta = dict(n=n, m=m, Gs=Gs, w=w, w8=w8, XW=XW, H=H,
                xpad_rows=xpad_rows)
    layout = dict(vals=vals_arr, c16=c16_arr, q0=q0_arr,
                  xbase_row=xbase_row, meta=tuple(sorted(meta.items())))
    return layout, tail, stats


def _pad_x(b_col, meta):
    """(n,) vector -> (xpad_rows, 128) zero-padded window source."""
    m, rows = meta["m"], meta["xpad_rows"]
    return jnp.pad(b_col, (0, rows * LANES - m)).reshape(rows, LANES)


@register("well_spmv", "reference")
def well_spmv_reference(vals, c16, q0, xbase_row, meta_items, b):
    """Oracle: same arrays, plain jnp gather (slow; correctness only)."""
    meta = dict(meta_items)
    Gs, w, n = meta["Gs"], meta["w"], meta["n"]
    k = b.shape[1]
    outs = []
    for kk in range(k):
        xp = _pad_x(b[:, kk], meta).reshape(-1)
        col_abs = (xbase_row[:, None, None, None].astype(jnp.int32) * LANES
                   + c16.astype(jnp.int32))
        g = xp[col_abs]                                  # (Gs, w, 8, 128)
        prod = vals.astype(b.dtype) * g
        w8 = meta["w8"]
        # sum slots: axis 1 groups (b*w8+j) carry block id b = idx // w8
        p = prod.reshape(Gs, _BLOCKS_PER_SB, w8, 8, LANES).sum(axis=(2, 3))
        outs.append(p.reshape(Gs * _SB_ROWS)[:n])
    return jnp.stack(outs, axis=1)


def _well_kernel(xbase_ref, q0_ref, xp_ref, vals_ref, c16_ref, out_ref,
                 vbuf, cbuf, xbuf, ybuf, vsem, csem, xsem, ysem,
                 *, Gs, w8, XWr, H, NB, acc_dtype):
    """One grid step; NB-deep manual DMA pipeline over superblocks."""

    def v_dma(t, j):
        return pltpu.make_async_copy(vals_ref.at[t], vbuf.at[j], vsem.at[j])

    def c_dma(t, j):
        return pltpu.make_async_copy(c16_ref.at[t], cbuf.at[j], csem.at[j])

    def x_dma(t, j):
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(xbase_ref[t], XWr), :], xbuf.at[j], xsem.at[j])

    def y_dma(t, j):
        return pltpu.make_async_copy(ybuf.at[j], out_ref.at[t], ysem.at[j])

    for j in range(NB):
        v_dma(j, j).start()
        c_dma(j, j).start()
        x_dma(j, j).start()

    def outer(o, _):
        for j in range(NB):
            t = o * NB + j
            v_dma(t, j).wait()
            c_dma(t, j).wait()
            x_dma(t, j).wait()

            @pl.when(o > 0)
            def _():
                y_dma(t - NB, j).wait()

            for b in range(_BLOCKS_PER_SB):
                acc = jnp.zeros((8, LANES), acc_dtype)
                for jg in range(w8):
                    q0 = q0_ref[(t * _BLOCKS_PER_SB + b) * w8 + jg]
                    win8 = xbuf[j, pl.ds(q0, 8), :]
                    c = cbuf[j, b * w8 + jg].astype(jnp.int32)
                    sub = jax.lax.shift_right_logical(c, jnp.int32(7))
                    lane = jax.lax.bitwise_and(c, jnp.int32(127))
                    srel = sub - q0
                    h0 = jnp.minimum(jnp.min(srel, axis=1, keepdims=True),
                                     8 - H)
                    h0b = jnp.broadcast_to(h0, (8, LANES))
                    srel2 = srel - h0b
                    g = jnp.zeros((8, LANES), acc_dtype)
                    for h in range(H):
                        t_h = jnp.take_along_axis(win8, h0b + h, axis=0)
                        gh = jnp.take_along_axis(t_h, lane, axis=1)
                        g = gh if h == 0 else jnp.where(srel2 == h, gh, g)
                    acc = acc + vbuf[j, b * w8 + jg].astype(acc_dtype) * g
                ybuf[j, b, :] = jnp.sum(acc, axis=0).astype(ybuf.dtype)
            y_dma(t, j).start()

            @pl.when(t + NB < Gs)
            def _():
                v_dma(t + NB, j).start()
                c_dma(t + NB, j).start()
                x_dma(t + NB, j).start()
        return 0

    jax.lax.fori_loop(0, Gs // NB, outer, 0)
    for j in range(NB):
        y_dma(Gs - NB + j, j).wait()


@functools.lru_cache(maxsize=64)
def _build_well_call(meta_items, dtype_name, interpret, NB=4):
    meta = dict(meta_items)
    Gs, w, w8, XW = meta["Gs"], meta["w"], meta["w8"], meta["XW"]
    NB = max(1, min(NB, Gs))
    Gs_pad = -(-Gs // NB) * NB
    dtype = jnp.dtype(dtype_name)
    XWr = XW // LANES
    kernel = functools.partial(
        _well_kernel, Gs=Gs_pad, w8=w8, XWr=XWr, H=meta["H"], NB=NB,
        acc_dtype=jnp.float32)
    vmem = NB * (w * 8 * LANES * (dtype.itemsize + 2)
                 + (XWr + 8) * LANES * dtype.itemsize) + (2 << 20)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,        # xbase_row, q0
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((NB, w, 8, LANES), dtype),
                        pltpu.VMEM((NB, w, 8, LANES), jnp.int16),
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


def well_spmv_pallas(vals, c16, q0, xbase_row, meta_items, b, *,
                     interpret=False):
    """Single- or multi-column apply; the Pallas call handles one column."""
    meta = dict(meta_items)
    n, Gs = meta["n"], meta["Gs"]
    call, Gs_pad = _build_well_call(meta_items, jnp.dtype(b.dtype).name,
                                    interpret)
    if Gs_pad != Gs:
        pad = Gs_pad - Gs
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad,) + vals.shape[1:], vals.dtype)])
        c16 = jnp.concatenate(
            [c16, jnp.zeros((pad,) + c16.shape[1:], c16.dtype)])
        q0 = jnp.concatenate(
            [q0, jnp.zeros((pad * _BLOCKS_PER_SB * meta["w8"],), q0.dtype)])
        xbase_row = jnp.concatenate(
            [xbase_row, jnp.zeros((pad,), xbase_row.dtype)])
    outs = []
    for kk in range(b.shape[1]):
        xp = _pad_x(b[:, kk], meta)
        y = call(xbase_row, q0, xp, vals, c16)
        outs.append(y.reshape(Gs_pad * _SB_ROWS)[:n])
    return jnp.stack(outs, axis=1)


@register("well_spmv", "tpu")
def well_spmv_tpu(vals, c16, q0, xbase_row, meta_items, b):
    ok = (jnp.dtype(b.dtype) == jnp.float32
          and jnp.dtype(vals.dtype) == jnp.float32)
    if not ok:
        from ..log.logger import PERFORMANCE_FALLBACK, dispatch
        dispatch(PERFORMANCE_FALLBACK, kernel="well_spmv",
                 reason="non-f32 dtype (Pallas path is f32-only)")
        return well_spmv_reference(vals, c16, q0, xbase_row, meta_items, b)
    return well_spmv_pallas(vals, c16, q0, xbase_row, meta_items, b)
