"""Pallas TPU kernels for banded (diagonal-offset) SpMV.

The TPU answer to Ginkgo's tuned CSR SpMV kernels
(``common/cuda_hip/matrix/csr_kernels.template.cpp``): for stencil-like
matrices the banded layout removes the gather entirely.  y[i] =
sum_d w[d,i] * x[i+off_d] with the flat index blocked as (sublane, lane) =
(i // 128, i % 128); a shift by ``off = q*128 + r`` becomes a lane-rotation
by r combined with a select between sublane windows q and q+1.

Pipeline design (this device's HBM only saturates with several DMAs in
flight — the default Mosaic grid pipeline is ~1-deep and caps well below
STREAM): a single grid step runs a software pipeline NB buffers deep with
manual async copies; diagonal values are pre-blocked at *build time* into
(G, D, S, 128) so each block's working set is one contiguous DMA
(Ginkgo's ``strategy_type::process`` analog: layout aux data computed when
the matrix is assembled, not per apply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .registry import register

LANES = 128


def plan_banded_layout(offsets, n, *, S=128, NB=4):
    """Static layout plan for a banded matrix (build-time)."""
    lo = -min(min(offsets), 0)
    hi = max(max(offsets), 0)
    LO = -(-lo // LANES)
    HI = hi // LANES + 1
    NS = -(-n // LANES)
    while S > 8 and S > NS:
        S //= 2
    G = -(-NS // S)
    NB = max(1, min(NB, G))
    G = -(-G // NB) * NB           # whole NB groups
    NSp = G * S
    W = -(-(S + LO + HI) // 8) * 8  # DMA windows: 8-sublane aligned
    HI += W - (S + LO + HI)
    return dict(S=S, NB=NB, LO=LO, HI=HI, W=W, G=G, NSp=NSp, n=n)


def block_diag_values(diag_values, meta):
    """(D, n) -> (G, D, S, 128) contiguous per-block chunks. Host/NumPy ok."""
    import numpy as np
    D, n = diag_values.shape
    NSp, S, G = meta["NSp"], meta["S"], meta["G"]
    dv = np.zeros((D, NSp * LANES), diag_values.dtype)
    dv[:, :n] = diag_values
    return np.ascontiguousarray(
        dv.reshape(D, G, S, LANES).transpose(1, 0, 2, 3))


def unblock_diag_values(dvb, meta):
    """(G, D, S, 128) -> (D, n) — used by the jnp reference tier."""
    G, D, S, _ = dvb.shape
    return jnp.transpose(dvb, (1, 0, 2, 3)).reshape(D, -1)[:, :meta["n"]]


def _plan_shifts(offsets):
    """Group (diag_index, sublane_shift q) by lane-rotation r."""
    by_r: dict[int, list[tuple[int, int]]] = {}
    for d, off in enumerate(offsets):
        q, r = divmod(int(off), LANES)
        by_r.setdefault(r, []).append((d, q))
    return tuple(sorted((r, tuple(v)) for r, v in by_r.items()))


def _compute_block(dblk, xw, *, by_r, S, LO, acc_dtype):
    """acc[s, l] = sum_d dblk[d, s, l] * x_window[shifted]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)
    acc = jnp.zeros((S, LANES), acc_dtype)
    for r, entries in by_r:
        # explicit i32 shift: a python int becomes an i64 operand under
        # x64, which tpu.dynamic_rotate rejects
        xr = (xw if r == 0
              else pltpu.roll(xw, jnp.int32((LANES - r) % LANES), 1))
        for d, q in entries:
            qq = q + LO  # static python int
            lo_part = xr[qq:qq + S, :]
            if r == 0:
                shifted = lo_part
            else:
                hi_part = xr[qq + 1:qq + 1 + S, :]
                shifted = jnp.where(lane < LANES - r, lo_part, hi_part)
            acc = acc + dblk[d].astype(acc_dtype) * shifted.astype(acc_dtype)
    return acc


def _dia_kernel(xp_ref, dvb_ref, out_ref, dbuf, xbuf, obuf, dsem, xsem, osem,
                *, by_r, S, LO, W, G, NB, K, acc_dtype):
    """Single-RHS (K=1): 2-D refs/buffers — measurably faster DMAs than the
    K-plane layout.  Multi-RHS: xp_ref (K, LO+NSp+HI, 128), out_ref
    (K, NSp, 128) — the dominant dvb stream is read ONCE per block and
    reused across all K columns (SpMM amortisation)."""
    flat = K == 1

    # indices coerced to i32: under x64 both python-int constants and
    # default loop counters lower as i64, which tpu.memref_slice rejects
    def _i32(v):
        return jnp.asarray(v, jnp.int32)

    def d_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(dvb_ref.at[t], dbuf.at[j], dsem.at[j])

    def x_dma(t, j):
        t, j = _i32(t), _i32(j)
        src = (xp_ref.at[pl.ds(t * S, W), :] if flat
               else xp_ref.at[:, pl.ds(t * S, W), :])
        return pltpu.make_async_copy(src, xbuf.at[j], xsem.at[j])

    def o_dma(t, j):
        t, j = _i32(t), _i32(j)
        dst = (out_ref.at[pl.ds(t * S, S), :] if flat
               else out_ref.at[:, pl.ds(t * S, S), :])
        return pltpu.make_async_copy(obuf.at[j], dst, osem.at[j])

    for j in range(NB):
        d_dma(j, j).start()
        x_dma(j, j).start()

    def outer(o, _):
        for j in range(NB):  # static slots -> no dynamic scratch indexing
            t = o * NB + j
            d_dma(t, j).wait()
            x_dma(t, j).wait()

            @pl.when(o > 0)
            def _():
                o_dma(t - NB, j).wait()   # slot's previous writeback done

            if flat:
                obuf[j] = _compute_block(
                    dbuf[j], xbuf[j], by_r=by_r, S=S, LO=LO,
                    acc_dtype=acc_dtype).astype(obuf.dtype)
            else:
                for kk in range(K):
                    obuf[j, kk] = _compute_block(
                        dbuf[j], xbuf[j, kk], by_r=by_r, S=S, LO=LO,
                        acc_dtype=acc_dtype).astype(obuf.dtype)
            o_dma(t, j).start()

            @pl.when(t + NB < G)
            def _():
                d_dma(t + NB, j).start()
                x_dma(t + NB, j).start()
        return 0

    # i32 loop counter: under x64 the default i64 trip index reaches
    # tpu.memref_slice, which requires 32-bit indices (chip-only fail)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(G // NB), outer, 0)
    for j in range(NB):
        o_dma(G - NB + j, j).wait()


_MAX_RHS = 8   # VMEM budget per kernel call: wider applies are processed
               # in <=_MAX_RHS-column chunks (dia_spmv_tpu), each
               # re-streaming dvb once


@functools.lru_cache(maxsize=64)
def _build_dia_call(offsets, D, K, dtype_name, dvb_dtype_name, meta_items,
                    interpret):
    """dvb may be stored at reduced precision (bf16/f16): the diagonal
    stream halves while xbuf/obuf/arithmetic stay in the vector dtype —
    the mixed-spmv capability at kernel level."""
    meta = dict(meta_items)
    dtype = jnp.dtype(dtype_name)          # vector/output dtype
    ddtype = jnp.dtype(dvb_dtype_name)     # diagonal storage dtype
    S, NB, LO, HI, W, G, NSp = (meta[k] for k in
                                ("S", "NB", "LO", "HI", "W", "G", "NSp"))
    kernel = functools.partial(
        _dia_kernel, by_r=_plan_shifts(offsets), S=S, LO=LO, W=W, G=G,
        NB=NB, K=K,
        acc_dtype=jnp.float32 if dtype.itemsize <= 4 else dtype)

    vmem = NB * (D * S * ddtype.itemsize
                 + K * (W + S) * dtype.itemsize) * LANES + (1 << 20)
    if K == 1:
        out_shape = jax.ShapeDtypeStruct((NSp, LANES), dtype)
        xbuf = pltpu.VMEM((NB, W, LANES), dtype)
        obuf = pltpu.VMEM((NB, S, LANES), dtype)
    else:
        out_shape = jax.ShapeDtypeStruct((K, NSp, LANES), dtype)
        xbuf = pltpu.VMEM((NB, K, W, LANES), dtype)
        obuf = pltpu.VMEM((NB, K, S, LANES), dtype)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((NB, D, S, LANES), ddtype),
                        xbuf, obuf,
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128 << 20, vmem * 2)),
        interpret=bool(interpret),
    )


def dia_spmv_pallas(offsets, dvb, meta, b, *, interpret=False):
    """dvb: (G, D, S, 128) blocked diagonals (value dtype or reduced
    bf16/f16 storage); b: (n, k), k <= _MAX_RHS. One dvb pass serves all
    k columns."""
    G, D, S, _ = dvb.shape
    k = b.shape[1]
    call = _build_dia_call(tuple(offsets), D, k, jnp.dtype(b.dtype).name,
                           jnp.dtype(dvb.dtype).name,
                           tuple(sorted(meta.items())), interpret)
    n, LO, HI, NSp = meta["n"], meta["LO"], meta["HI"], meta["NSp"]
    if k == 1:
        xp = jnp.pad(b[:, 0], (LO * LANES, NSp * LANES - n + HI * LANES)
                     ).reshape(LO + NSp + HI, LANES)
        out = call(xp, dvb)
        return out.reshape(NSp * LANES)[:n][:, None]
    xp = jnp.pad(b, ((LO * LANES, NSp * LANES - n + HI * LANES),
                     (0, 0))).T.reshape(k, LO + NSp + HI, LANES)
    out = call(xp, dvb)
    return out.reshape(k, NSp * LANES)[:, :n].T


def _dia_chunked(offsets, dvb, meta, b, *, interpret=False):
    """Column-chunked real-plane dispatch (each <=_MAX_RHS chunk re-streams
    dvb once; still far cheaper than the jnp tier's per-diagonal passes)."""
    if b.shape[1] > _MAX_RHS:
        outs = [dia_spmv_pallas(offsets, dvb, meta, b[:, i:i + _MAX_RHS],
                                interpret=interpret)
                for i in range(0, b.shape[1], _MAX_RHS)]
        return jnp.concatenate(outs, axis=1)
    return dia_spmv_pallas(offsets, dvb, meta, b, interpret=interpret)


def dia_spmv_complex(offsets, dvb, meta, b, *, interpret=False):
    """Complex banded SpMV on the real-plane Pallas kernel.

    The reference instantiates its GPU SpMV kernels for complex value
    types directly (``common/cuda_hip/matrix/``, value-type macros in
    ``include/ginkgo/core/base/types.hpp:459-476``); Mosaic has no complex
    vregs, so the TPU formulation splits into re/im planes:

        [y_re | y_im] = A_re @ [x_re | x_im]  then  A_im @ [x_re | x_im]
        y = (p_re[:, :k] - p_im[:, k:])  +  i (p_re[:, k:] + p_im[:, :k])

    Two real kernel passes stream exactly the matrix's c64 bytes (each
    plane once); the column-stacked multivector reuses each dvb block for
    both components (the SpMM amortisation).  The plane split itself is
    loop-invariant, so XLA's while-loop LICM hoists it out of solver
    iteration loops — per-iteration HBM traffic is plane reads only.
    """
    cdt = jnp.result_type(b.dtype, dvb.dtype)      # complex64
    rdt = jnp.dtype(jnp.float32)
    if jnp.issubdtype(dvb.dtype, jnp.complexfloating):
        planes = (jnp.real(dvb).astype(rdt), jnp.imag(dvb).astype(rdt))
    else:
        planes = (dvb, None)
    yre, yim = dia_spmv_c64_planes(
        offsets, planes[0], planes[1], meta,
        jnp.real(b).astype(rdt), jnp.imag(b).astype(rdt),
        interpret=interpret)
    return (yre + 1j * yim).astype(cdt)


def dia_spmv_c64_planes(offsets, dvb_re, dvb_im, meta, x_re, x_im, *,
                        interpret=False):
    """The real-plane core of the complex banded SpMV: planes in, planes
    out, no complex dtype anywhere in the compiled graph.  This is the
    production path ``dia_spmv_complex`` compiles to; it is public so
    backends whose runtime cannot compile complex executables (the axon
    tunnel used for single-chip benchmarking here) can still run the c64
    kernel math, and so plane-resident solvers avoid the split/assemble
    round-trip.  ``dvb_im=None`` means a real matrix."""
    k = x_re.shape[1]
    xs = jnp.concatenate([x_re, x_im], axis=1)
    if dvb_im is not None:
        pr = _dia_chunked(offsets, dvb_re, meta, xs, interpret=interpret)
        pi = _dia_chunked(offsets, dvb_im, meta, xs, interpret=interpret)
        return pr[:, :k] - pi[:, k:], pr[:, k:] + pi[:, :k]
    p = _dia_chunked(offsets, dvb_re, meta, xs, interpret=interpret)
    return p[:, :k], p[:, k:]


def _c64_capable(b_dtype, v_dtype) -> bool:
    """True when the complex plane split applies: c64/f32 components on
    both sides (c128's f64 components have no Mosaic lowering)."""
    c64 = jnp.dtype(jnp.complex64)
    f32ish = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
              jnp.dtype(jnp.float16))
    bd, vd = jnp.dtype(b_dtype), jnp.dtype(v_dtype)
    return ((bd == c64 or bd in f32ish)
            and (vd == c64 or vd in f32ish)
            and (bd == c64 or vd == c64))


@register("dia_spmv", "tpu")
def dia_spmv_tpu(offsets, dvb, meta, b):
    ok_mixed = (jnp.dtype(b.dtype) == jnp.float32
                and jnp.dtype(dvb.dtype) in (jnp.dtype(jnp.bfloat16),
                                             jnp.dtype(jnp.float16),
                                             jnp.dtype(jnp.float32)))
    if _c64_capable(b.dtype, dvb.dtype):
        return dia_spmv_complex(offsets, dvb, meta,
                                b.astype(jnp.complex64))
    if jnp.issubdtype(b.dtype, jnp.complexfloating) \
            or jnp.issubdtype(dvb.dtype, jnp.complexfloating) \
            or jnp.dtype(b.dtype).itemsize > 4 \
            or (b.dtype != dvb.dtype and not ok_mixed):
        from .spmv import dia_spmv
        return dia_spmv(offsets, dvb, meta, b)
    return _dia_chunked(offsets, dvb, meta, b)
