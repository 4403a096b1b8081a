"""Packed-slot windowed-ELL Pallas SpMV — the general-matrix fast path.

Third-generation TPU answer to Ginkgo's load-balanced CSR SpMV
(``common/cuda_hip/matrix/csr_kernels.template.cpp:251-472``), refining
`spmv_windowed.py` (H-way gather/select per vreg) and `spmv_chunked.py`
(one chunk per vreg, but 8-slot rounding per (block, chunk) group costs
6-7x padding on scattered matrices).

Key idea: a *slot* is one (1, 128) sublane row holding the j-th entry
in x-chunk ``c`` of each of 128 rows — so every element of a slot reads
from the SAME 128-wide x chunk.  Slots are sorted by chunk and packed
8-per-vreg inside an aligned 8-chunk window, giving the kernel

    win8 = x_window[8w : 8w+8]                  # tile-aligned slice
    t    = dynamic_gather(win8, idx >> 7, axis=0)   # sublane gather
    g    = dynamic_gather(t,   idx & 127, axis=1)   # lane gather
    acc += vals * g

with the packed per-entry index simply ``(col - window_base) & 1023``
(int16).  Padding is only (a) per-(block, chunk) max-over-rows slot
count and (b) rounding each aligned window's slot count to 8 — about
1.1-1.5x on banded/stencil and RCM'd matrices.

Entries that overflow the per-superblock x window or the static vreg
budget spill to a COO tail handled by the classical kernel (same escape
hatch as the banded strategy).
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
_ROWS_PER_BLOCK = 128
_BLOCKS_PER_SB = 8
_SB_ROWS = _ROWS_PER_BLOCK * _BLOCKS_PER_SB
_XW_CAP = 16384
_WV_CAP = 192              # max vregs (of 8 slots) per 128-row block


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def plan_packed_layout(d, values_np, *, wv_cap=_WV_CAP, xw_cap=_XW_CAP,
                       max_pad=None, max_tail=None):
    """Build the packed-slot layout from canonical MatrixData.

    Returns (layout, tail, stats); layout holds numpy arrays
    ``vals (Gs, 8*Wv, 8, 128)``, ``idx`` (same shape, int16, packed
    ``(chunk & 7) * 128 + lane``), ``qw (Gs*8*Wv,) int32`` (aligned
    window row-group per vreg, units of 8 rows), ``xbase_row (Gs,)``
    and static ``meta``.  ``tail`` is (rows, cols, vals) of spills.
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

    # 1. per-superblock x window (>= 1024 so aligned 8-chunk groups fit)
    mincol = np.full(Gs, np.int64(1) << 60)
    maxcol = np.full(Gs, -1, np.int64)
    np.minimum.at(mincol, sb, cols)
    np.maximum.at(maxcol, sb, cols)
    empty_sb = maxcol < 0
    mincol[empty_sb] = 0
    maxcol[empty_sb] = 0
    xbase = (mincol // LANES) * LANES
    span = maxcol - xbase + 1
    XW = max(min(_pow2ceil(int(span.max())), xw_cap), 8 * LANES)
    spill = cols - xbase[sb] >= XW
    keep = ~spill

    crel = np.where(keep, cols - xbase[sb], 0)
    chunk = crel >> 7
    C = XW // LANES            # multiple of 8
    W8 = C // 8                # aligned 8-chunk window groups

    # 2. within-(row, chunk) position j (canonical order => contiguous
    #    runs; window spills are a per-row suffix, so j stays dense)
    key = np.where(keep, rows * C + chunk, -1)
    new_run = np.ones(nnz, bool)
    new_run[1:] = key[1:] != key[:-1]
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    j = np.arange(nnz) - run_start[run_id]

    # 3. per-(block, chunk) slot counts K; slots sorted by chunk pack
    #    into vregs within each aligned window group
    gid = blk * C + chunk
    K = np.zeros(n_blk * C, np.int64)
    np.maximum.at(K, gid[keep], j[keep] + 1)
    K2 = K.reshape(n_blk, W8, 8)
    S = K2.sum(axis=2)                       # slots per (block, wgroup)
    Vg = -(-S // 8)                          # vregs per (block, wgroup)
    V_b = Vg.sum(axis=1)
    Wv = int(min(max(int(V_b.max()), 1), wv_cap))

    # slot base of chunk (b, c): 8 * (vregs of earlier wgroups) +
    # slots of earlier chunks in the same wgroup
    vg_base = np.zeros_like(Vg)
    np.cumsum(Vg[:, :-1], axis=1, out=vg_base[:, 1:])
    in_grp = np.zeros_like(K2)
    np.cumsum(K2[:, :, :-1], axis=2, out=in_grp[:, :, 1:])
    chunk_base = (8 * vg_base)[:, :, None] + in_grp
    chunk_base = chunk_base.reshape(n_blk * C)

    s = chunk_base[gid] + j
    spill |= keep & (s >= Wv * 8)
    keep = ~spill

    # acceptance pre-check BEFORE materializing the padded arrays — the
    # dense vals/idx allocation below is hundreds of MB for matrices the
    # caller is about to reject anyway (measured 12 s per automatical
    # from_data on a 3.2M-nnz SpGEMM product)
    ell_pre = int(keep.sum())
    tail_pre = int(spill.sum())
    pad_pre = Gs * _BLOCKS_PER_SB * Wv * 8 * LANES / max(ell_pre, 1)
    if ((max_pad is not None and pad_pre > max_pad)
            or (max_tail is not None and tail_pre > max_tail * max(nnz, 1))):
        return None, None, {"ell_nnz": ell_pre, "tail_nnz": tail_pre,
                            "pad_ratio": pad_pre, "Wv": Wv, "XW": XW,
                            "rejected": True}

    # 4. per-vreg window group qw (vreg v of block b reads x rows
    #    [8*qw, 8*qw+8)); padding vregs use group 0
    qw = np.zeros((n_blk, Wv), np.int32)
    cnt = np.minimum(Vg, np.maximum(Wv - vg_base, 0)).reshape(-1)
    rep_b = np.repeat(np.repeat(np.arange(n_blk), W8), cnt)
    rep_w = np.repeat(np.tile(np.arange(W8), n_blk), cnt)
    starts = np.repeat(vg_base.reshape(-1), cnt)
    within = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    qw[rep_b, starts + within] = rep_w

    # 5. final dense arrays.  The kernel composes a sublane gather
    #    (idx >> 7) with a lane gather (idx & 127); that composition is
    #    only exact when the sublane index is CONSTANT within a slot —
    #    so padded lanes of a live slot must carry the slot's chunk in
    #    their index (their value is 0, so the gathered x is harmless).
    vals_arr = np.zeros((n_blk, Wv * 8, _ROWS_PER_BLOCK),
                        values_np.dtype)
    idx_arr = np.zeros((n_blk, Wv * 8, _ROWS_PER_BLOCK), np.int16)
    live = K > 0                                # (n_blk*C,) live chunks
    lg = np.flatnonzero(live)
    lcnt = K[lg]
    lbase = chunk_base[lg]
    lchunk = (lg % C) & 7
    pos = np.arange(lcnt.sum()) - np.repeat(np.cumsum(lcnt) - lcnt,
                                            lcnt)
    slot_ids = np.repeat(lbase, lcnt) + pos
    slot_blk = np.repeat(lg // C, lcnt)
    ok_slot = slot_ids < Wv * 8
    idx_arr[slot_blk[ok_slot], slot_ids[ok_slot], :] = (
        np.repeat(lchunk, lcnt)[ok_slot, None].astype(np.int16) * 128)
    lr = rows & 127
    vals_arr[blk[keep], s[keep], lr[keep]] = vals[keep]
    idx_arr[blk[keep], s[keep], lr[keep]] = (crel & 1023)[keep]
    vals_arr = np.ascontiguousarray(vals_arr.reshape(
        Gs, _BLOCKS_PER_SB * Wv, 8, LANES))
    idx_arr = np.ascontiguousarray(idx_arr.reshape(
        Gs, _BLOCKS_PER_SB * Wv, 8, LANES))
    qw_arr = np.ascontiguousarray(qw.reshape(-1))
    xbase_row = (xbase // LANES).astype(np.int32)
    xpad_rows = int(xbase_row.max()) + C

    ell_nnz = int(keep.sum())
    tail = (rows[spill], cols[spill], vals[spill])
    stats = {"ell_nnz": ell_nnz, "tail_nnz": int(spill.sum()),
             "pad_ratio": Gs * _BLOCKS_PER_SB * Wv * 8 * LANES
             / max(ell_nnz, 1), "Wv": Wv, "XW": XW}
    meta = dict(n=n, m=m, Gs=Gs, Wv=Wv, XW=XW, xpad_rows=xpad_rows)
    layout = dict(vals=vals_arr, idx=idx_arr, qw=qw_arr,
                  xbase_row=xbase_row, meta=tuple(sorted(meta.items())))
    return layout, tail, stats


def _pad_x(b_col, meta):
    m, rows = meta["m"], meta["xpad_rows"]
    return jnp.pad(b_col, (0, rows * LANES - m)).reshape(rows, LANES)


@register("pell_spmv", "reference")
def pell_spmv_reference(vals, idx, qw, xbase_row, meta_items, b):
    """Oracle: same arrays, plain jnp gather (correctness only)."""
    meta = dict(meta_items)
    Gs, Wv, n = meta["Gs"], meta["Wv"], meta["n"]
    qw2 = qw.reshape(Gs, _BLOCKS_PER_SB * Wv)
    outs = []
    for kk in range(b.shape[1]):
        xp = _pad_x(b[:, kk], meta).reshape(-1)
        # absolute elem = (xbase + 8*qw + (idx>>7)) * 128 + (idx & 127)
        i32 = idx.astype(jnp.int32)
        row_abs = (xbase_row[:, None].astype(jnp.int32)
                   + 8 * qw2)[:, :, None, None] + (i32 >> 7)
        g = xp[row_abs * LANES + (i32 & 127)]
        prod = vals.astype(b.dtype) * g
        p = prod.reshape(Gs, _BLOCKS_PER_SB, Wv, 8, LANES).sum(
            axis=(2, 3))
        outs.append(p.reshape(Gs * _SB_ROWS)[:n])
    return jnp.stack(outs, axis=1)


def _take_along(arr, idx, axis):
    """take_along_axis with trace-time x64 disabled: under x64 jnp's
    index-dtype heuristic emits an i64 convert that Mosaic cannot lower
    (the kernel's indices are int32 by construction)."""
    try:
        from jax._src import config as _jcfg
        ctx = _jcfg.enable_x64(False)
    except Exception:                      # pragma: no cover - jax internals
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        return jnp.take_along_axis(arr, idx, axis=axis)


def _pell_kernel(xbase_ref, qw_ref, xp_ref, vals_ref, idx_ref, out_ref,
                 vbuf, ibuf, xbuf, ybuf, vsem, isem, xsem, ysem,
                 *, Gs, Wv, XWr, NB, K, acc_dtype):
    """One grid step; NB-deep manual DMA pipeline over superblocks.

    Multi-RHS: the matrix tiles (vals+idx, the dominant HBM stream) are
    loaded ONCE per superblock and reused for all K columns — only the
    x windows and gathers repeat per column, the SpMM trick of the
    banded kernel (spmv_pallas.py) applied to the packed layout."""

    # i32 index coercion: x64 lowers python ints / default counters to
    # i64, which tpu.memref_slice rejects
    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    def v_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(vals_ref.at[t], vbuf.at[j],
                                     vsem.at[j])

    def i_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(idx_ref.at[t], ibuf.at[j],
                                     isem.at[j])

    def x_dma(t, j, k):
        t, j, k = _i32(t), _i32(j), _i32(k)
        return pltpu.make_async_copy(
            xp_ref.at[k, pl.ds(xbase_ref[t], XWr), :], xbuf.at[j, k],
            xsem.at[j, k])

    def y_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(ybuf.at[j], out_ref.at[t],
                                     ysem.at[j])

    for j in range(NB):
        v_dma(j, j).start()
        i_dma(j, j).start()
        for k in range(K):
            x_dma(j, j, k).start()

    def outer(o, _):
        for j in range(NB):
            t = o * NB + j
            v_dma(t, j).wait()
            i_dma(t, j).wait()
            for k in range(K):
                x_dma(t, j, k).wait()

            @pl.when(o > 0)
            def _():
                y_dma(t - NB, j).wait()

            for b in range(_BLOCKS_PER_SB):
                acc = [jnp.zeros((8, LANES), acc_dtype) for _ in range(K)]
                for v in range(Wv):
                    q = qw_ref[(t * _BLOCKS_PER_SB + b) * Wv + v]
                    i32 = ibuf[j, b * Wv + v].astype(jnp.int32)
                    sub = jax.lax.shift_right_logical(i32, jnp.int32(7))
                    lane = jax.lax.bitwise_and(i32, jnp.int32(127))
                    val = vbuf[j, b * Wv + v].astype(acc_dtype)
                    for k in range(K):
                        win8 = xbuf[j, k, pl.ds(q * 8, 8), :]
                        t1 = _take_along(win8, sub, 0)
                        g = _take_along(t1, lane, 1)
                        acc[k] = acc[k] + val * g
                for k in range(K):
                    ybuf[j, k, b, :] = jnp.sum(acc[k], axis=0).astype(
                        ybuf.dtype)
            y_dma(t, j).start()

            @pl.when(t + NB < Gs)
            def _():
                v_dma(t + NB, j).start()
                i_dma(t + NB, j).start()
                for k in range(K):
                    x_dma(t + NB, j, k).start()
        return 0

    # i32 loop counter (x64 would feed i64 into tpu.memref_slice)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(Gs // NB), outer, 0)
    for j in range(NB):
        y_dma(Gs - NB + j, j).wait()


_MAX_RHS = 8               # matrix tiles stream once per <=8-column chunk


@functools.lru_cache(maxsize=64)
def _build_pell_call(meta_items, dtype_name, interpret, K=1, NB=4,
                     vdtype_name=None):
    """``vdtype_name``: value-storage dtype (bf16/f16 storage halves the
    dominant vals stream while gathers/accumulation stay f32 — same
    mixed-storage trick as the banded kernel)."""
    meta = dict(meta_items)
    Gs, Wv, XW = meta["Gs"], meta["Wv"], meta["XW"]
    NB = max(1, min(NB, Gs))
    Gs_pad = -(-Gs // NB) * NB
    dtype = jnp.dtype(dtype_name)
    vdtype = jnp.dtype(vdtype_name or dtype_name)
    XWr = XW // LANES
    kernel = functools.partial(
        _pell_kernel, Gs=Gs_pad, Wv=Wv, XWr=XWr, NB=NB, K=K,
        acc_dtype=jnp.float32)
    slots = _BLOCKS_PER_SB * Wv
    vmem = NB * (slots * 8 * LANES * (vdtype.itemsize + 2)
                 + K * XWr * LANES * dtype.itemsize) + (2 << 20)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,        # xbase_row, qw
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((NB, slots, 8, LANES), vdtype),
                        pltpu.VMEM((NB, slots, 8, LANES), jnp.int16),
                        pltpu.VMEM((NB, K, XWr, LANES), dtype),
                        pltpu.VMEM((NB, K, _BLOCKS_PER_SB, LANES), dtype),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB, K)),
                        pltpu.SemaphoreType.DMA((NB,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Gs_pad, K, _BLOCKS_PER_SB, LANES),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 << 20, vmem * 2)),
        interpret=bool(interpret),
    ), Gs_pad


def _pad_x_chunk(b_chunk, meta):
    """(m, K) columns -> (K, xpad_rows, LANES)."""
    m, rows = meta["m"], meta["xpad_rows"]
    K = b_chunk.shape[1]
    return jnp.pad(b_chunk, ((0, rows * LANES - m), (0, 0))).T.reshape(
        K, rows, LANES)


def pell_spmv_pallas(vals, idx, qw, xbase_row, meta_items, b, *,
                     interpret=False):
    meta = dict(meta_items)
    n, Gs, Wv = meta["n"], meta["Gs"], meta["Wv"]
    outs = []
    padded = None
    for k0 in range(0, b.shape[1], _MAX_RHS):
        chunk = b[:, k0:k0 + _MAX_RHS]
        K = chunk.shape[1]
        call, Gs_pad = _build_pell_call(meta_items,
                                        jnp.dtype(b.dtype).name,
                                        interpret, K,
                                        vdtype_name=jnp.dtype(
                                            vals.dtype).name)
        if padded is None:
            if Gs_pad != Gs:
                pad = Gs_pad - Gs
                vals = jnp.concatenate(
                    [vals, jnp.zeros((pad,) + vals.shape[1:], vals.dtype)])
                idx = jnp.concatenate(
                    [idx, jnp.zeros((pad,) + idx.shape[1:], idx.dtype)])
                qw = jnp.concatenate(
                    [qw, jnp.zeros((pad * _BLOCKS_PER_SB * Wv,), qw.dtype)])
                xbase_row = jnp.concatenate(
                    [xbase_row, jnp.zeros((pad,), xbase_row.dtype)])
            padded = True
        xp = _pad_x_chunk(chunk, meta)
        y = call(xbase_row, qw, xp, vals, idx)     # (Gs_pad, K, 8, LANES)
        outs.append(y.transpose(0, 2, 3, 1).reshape(
            Gs_pad * _SB_ROWS, K)[:n])
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def pell_spmv_complex(vals, idx, qw, xbase_row, meta_items, b, *,
                      interpret=False):
    """Complex packed SpMV via re/im planes on the real kernel — same
    formulation as ``spmv_pallas.dia_spmv_complex`` (the index/qw streams
    are shared between the two plane passes; only the value plane
    differs).  Plane splits are loop-invariant and LICM-hoisted out of
    solver loops."""
    cdt = jnp.result_type(b.dtype, vals.dtype)     # complex64
    rdt = jnp.dtype(jnp.float32)
    if jnp.issubdtype(vals.dtype, jnp.complexfloating):
        planes = (jnp.real(vals).astype(rdt), jnp.imag(vals).astype(rdt))
    else:
        planes = (vals, None)
    yre, yim = pell_spmv_c64_planes(
        planes[0], planes[1], idx, qw, xbase_row, meta_items,
        jnp.real(b).astype(rdt), jnp.imag(b).astype(rdt),
        interpret=interpret)
    return (yre + 1j * yim).astype(cdt)


def pell_spmv_c64_planes(vals_re, vals_im, idx, qw, xbase_row, meta_items,
                         x_re, x_im, *, interpret=False):
    """Real-plane core of the complex packed SpMV (planes in/out, no
    complex dtype in the compiled graph) — see
    ``spmv_pallas.dia_spmv_c64_planes`` for why this is public.
    ``vals_im=None`` means a real matrix."""
    k = x_re.shape[1]
    xs = jnp.concatenate([x_re, x_im], axis=1)
    if vals_im is not None:
        pr = pell_spmv_pallas(vals_re, idx, qw, xbase_row, meta_items, xs,
                              interpret=interpret)
        pi = pell_spmv_pallas(vals_im, idx, qw, xbase_row, meta_items, xs,
                              interpret=interpret)
        return pr[:, :k] - pi[:, k:], pr[:, k:] + pi[:, :k]
    p = pell_spmv_pallas(vals_re, idx, qw, xbase_row, meta_items, xs,
                         interpret=interpret)
    return p[:, :k], p[:, k:]


@register("pell_spmv", "tpu")
def pell_spmv_tpu(vals, idx, qw, xbase_row, meta_items, b):
    from .spmv_pallas import _c64_capable
    if _c64_capable(b.dtype, vals.dtype):
        return pell_spmv_complex(vals, idx, qw, xbase_row, meta_items,
                                 b.astype(jnp.complex64))
    ok = (jnp.dtype(b.dtype) == jnp.float32
          and jnp.dtype(vals.dtype) in (jnp.dtype(jnp.float32),
                                        jnp.dtype(jnp.bfloat16),
                                        jnp.dtype(jnp.float16)))
    if not ok:
        from ..log.logger import PERFORMANCE_FALLBACK, dispatch
        dispatch(PERFORMANCE_FALLBACK, kernel="pell_spmv",
                 reason="unsupported dtype (Pallas path: f32/c64 vectors, "
                        "f32/bf16/f16/c64 values)")
        return pell_spmv_reference(vals, idx, qw, xbase_row,
                                   meta_items, b)
    return pell_spmv_pallas(vals, idx, qw, xbase_row, meta_items, b)
