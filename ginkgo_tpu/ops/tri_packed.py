"""Exact block-partitioned trisolve for UNSTRUCTURED triangular factors.

``ops/tri_banded.py`` covers factors with <=64 diagonal offsets (its
cross-block term is D shifted MACs over value planes); factors from the
packed ParILUT path have arbitrary in-band sparsity and fell back to
num_levels nilpotent sweeps (13.4 ms at 262k) or the level scan
(199 ms).  The reference solves any pattern with syncfree row
scheduling (``cuda/solver/common_trs_kernels.cuh``) — fine-grained
spin-waiting a TPU cannot express.  The TPU-native formulation keeps
the block-partitioned inverse and generalizes the cross-block term to
an ELL gather from a VMEM carry window:

* rows are partitioned into S=256 blocks; within-block lower triangles
  are densified ON DEVICE (one scatter into an identity-initialized
  (nb, S, S) slab) and inverted by the MXU doubling inverse
  (``ops/tri_inv.batched_lowtri_inverse``) — no host trtri loop, no
  (nb, S, S) transfer;
* cross-block entries (column in one of the previous P blocks,
  P = ceil(bandwidth/S)) are packed as per-row ELL slots in
  (nb, Wv, 8, 128) vregs — four (2, 128) w-planes per vreg — with
  int16 indices relative to the carry window;
* ONE Pallas kernel scans the blocks sequentially: per block, the
  cross contribution is nwv[t] windowed gathers from the (2P, 128)
  carry scratch (the pair-kernel ``_gatherw`` select-chain), the solve
  is one (S, S) @ (S, 1) MXU matvec against the DMA-pipelined block
  inverse, and the carry shifts by one block.

Per-apply HBM traffic ~ n*S*4 bytes (the inverses) + the ELL slots —
at n=262k that is ~270 MB -> ~0.4 ms on v5e, vs 13.4/199 ms today.
Upper factors run as reversed lower systems (same convention as
tri_banded).  f32; k>1 right-hand sides map over columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .registry import register

_S = 256                     # rows per block (power of two)
_SR = _S // 128              # (2, 128) vector tile per block
_MAX_P = 32                  # carry window cap: P*S <= 8192 (int16 ok)
_MAX_WV = 64                 # cross ELL vregs per block (4 w-planes each)
_MAX_PLAN_BYTES = 1 << 30    # device-resident plan budget (inverse slab
                             # + cross streams), mirroring tri_banded's
                             # _MAX_INV_BYTES — over-budget factors fall
                             # back to the level/sweep paths


def plan_packed_trisolve(data, lower: bool, unit_diagonal: bool):
    """Host symbolics + device build for the packed trisolve, or None
    when the factor exceeds the window/width budgets.  Returns
    (device arrays dict, static meta).

    Split into pattern-only symbolics (cached on a pattern digest —
    the reference's reuse story: a same-pattern factor with new values
    re-scatters and re-inverts ON DEVICE, skipping the host passes)
    and the numeric device build."""
    sym = _cached_symbolics(data, lower, unit_diagonal)
    if sym is None:
        return None
    v = np.asarray(data.values)
    f32 = jnp.float32
    cv = v[sym["cross"]][sym["order"]].astype(f32)
    iv = v[sym["inb_sel"]].astype(f32)
    inv = _build_inverse(sym["bdest_d"], jnp.asarray(iv),
                         nb=sym["nb"])
    crossv = jnp.zeros((sym["nb"] * sym["Wv"] * 8 * 128,), f32).at[
        sym["dest_d"]].set(jnp.asarray(cv)).reshape(
        sym["nb"], sym["Wv"], 8, 128)
    arrays = dict(inv=inv, crossi=sym["crossi_d"], crossv=crossv,
                  nwv=sym["nwv_d"])
    return arrays, sym["meta"]


from ..utils.plancache import SingleSlotCache, pattern_digest

_SYM_CACHE = SingleSlotCache()   # key: (lower, unit, dtype kind)


def _cached_symbolics(data, lower, unit_diagonal):
    dig = pattern_digest(data.row_idx, data.col_idx,
                         ints=(data.shape[0], data.nnz))
    # dtype KIND is part of the key: complex factors reject in the
    # symbolics (planes would double everything), and a pattern-only
    # key would let an f32 plan serve — and silently .astype(f32) —
    # a complex factor with the same pattern
    key = (bool(lower), bool(unit_diagonal),
           np.dtype(data.values.dtype).kind)
    hit = _SYM_CACHE.get(key, dig)
    if hit is not _SYM_CACHE.MISS:
        return hit           # may be None: cached reject
    return _SYM_CACHE.put(
        key, dig, _trisolve_symbolics(data, lower, unit_diagonal))


def _trisolve_symbolics(data, lower, unit_diagonal):
    """Pattern-only layout planning; see plan_packed_trisolve."""
    n, m = data.shape
    if n != m or n < 2 * _S or data.nnz == 0:
        return None
    r = data.row_idx.astype(np.int64)
    c = data.col_idx.astype(np.int64)
    if np.issubdtype(data.values.dtype, np.complexfloating):
        return None             # planes would double everything; later
    if not lower:               # reversed-order rows turn U into an L
        r, c = (n - 1) - r, (n - 1) - c
    if (c > r).any():
        return None             # not triangular on the expected side
    nb = -(-n // _S)
    blk = r // _S
    cross = c < blk * _S
    bw = int((r[cross] - c[cross]).max()) if cross.any() else 1
    P = max(1, -(-bw // _S))
    if P > _MAX_P:
        return None
    # cross ELL: per-row slot ids in (row-major canonical) entry order
    cr, cc = r[cross], c[cross]
    order = np.lexsort((cc, cr))
    cr, cc = cr[order], cc[order]
    cnt = np.bincount(cr, minlength=n)
    Wmax = int(cnt.max()) if cnt.size else 0
    Wv = max(1, -(-Wmax // 4))
    if Wv > _MAX_WV:
        return None
    # device-resident storage budget: (nb, S, S) f32 inverses + the
    # int16+f32 cross streams; over budget -> None (auto-routing falls
    # back to the level/sweep solves instead of an HBM OOM)
    if nb * _S * _S * 4 + nb * Wv * 8 * 128 * 6 > _MAX_PLAN_BYTES:
        return None
    starts = np.zeros(n, np.int64)
    starts[1:] = np.cumsum(cnt)[:-1]
    w_of = np.arange(cr.size) - starts[cr]     # slot within the row
    s_of = cr - (cr // _S) * _S
    t_of = cr // _S
    # vreg layout: plane w -> vreg w//4, sub-rows (w%4)*2 + s//128
    vreg = w_of // 4
    sub = (w_of % 4) * 2 + s_of // 128
    lane = s_of % 128
    dest = ((t_of * Wv + vreg) * 8 + sub) * 128 + lane
    idx16 = (cc - (t_of - P) * _S).astype(np.int16)
    nwv = np.zeros(nb, np.int32)
    np.maximum.at(nwv, t_of, (vreg + 1).astype(np.int32))
    # in-block dense scatter targets (skip diagonal when unit)
    inb_sel = np.flatnonzero(~cross)
    ir, ic = r[inb_sel], c[inb_sel]
    if unit_diagonal:
        keep = ir != ic
        inb_sel, ir, ic = inb_sel[keep], ir[keep], ic[keep]
    ib = ir // _S
    bdest = (ib * _S + (ir - ib * _S)) * _S + (ic - ib * _S)
    dest_d = jnp.asarray(dest)
    crossi_d = jnp.zeros((nb * Wv * 8 * 128,), jnp.int16).at[
        dest_d].set(jnp.asarray(idx16)).reshape(nb, Wv, 8, 128)
    meta = dict(n=int(n), nb=int(nb), P=int(P), Wv=int(Wv),
                flip=not lower, unit=bool(unit_diagonal))
    return dict(nb=int(nb), Wv=int(Wv), cross=cross, order=order,
                inb_sel=inb_sel, dest_d=dest_d, crossi_d=crossi_d,
                bdest_d=jnp.asarray(bdest), nwv_d=jnp.asarray(nwv),
                meta=tuple(sorted(meta.items())))


@functools.partial(jax.jit, static_argnames=("nb",))
def _build_inverse(bdest, ivals, nb):
    from .tri_inv import batched_lowtri_inverse
    eye = jnp.broadcast_to(jnp.eye(_S, dtype=ivals.dtype),
                           (nb, _S, _S)).reshape(-1)
    Lb = eye.at[bdest].set(ivals).reshape(nb, _S, _S)
    return batched_lowtri_inverse(Lb)


def _tri_kernel(nwv_ref, inv_hbm, ci_hbm, cv_hbm, b_hbm, out_hbm,
                invw, civ, cvv, bwin, carry, yb,
                isem, csem, bsem, ysem, *, nb, P, Wv, NB):
    """Sequential block scan; NB-deep DMA pipeline (pair-kernel style)."""

    def _i32(t):
        return jnp.asarray(t, jnp.int32)

    def inv_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(inv_hbm.at[t], invw.at[j],
                                     isem.at[j])

    def c_dma(t, j):
        t, j = _i32(t), _i32(j)
        return (pltpu.make_async_copy(ci_hbm.at[t], civ.at[j],
                                      csem.at[j, 0]),
                pltpu.make_async_copy(cv_hbm.at[t], cvv.at[j],
                                      csem.at[j, 1]))

    def b_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(t * _SR, _SR), :], bwin.at[j], bsem.at[j])

    def y_dma(t, j):
        t, j = _i32(t), _i32(j)
        return pltpu.make_async_copy(
            yb.at[j], out_hbm.at[pl.ds(t * _SR, _SR), :], ysem.at[j])

    def start_in(t, j):
        inv_dma(t, j).start()
        for d in c_dma(t, j):
            d.start()
        b_dma(t, j).start()

    carry[...] = jnp.zeros(carry.shape, jnp.float32)
    for j in range(NB):
        start_in(j, j)

    def step(t, j):
        inv_dma(t, j).wait()
        for d in c_dma(t, j):
            d.wait()
        b_dma(t, j).wait()

        @pl.when(t >= NB)
        def _():
            y_dma(t - NB, j).wait()

        from .pair_contract import _gatherw
        rows = P * _SR

        def vbody(v, acc):
            g = _gatherw(carry[...], civ[j, v].astype(jnp.int32), rows)
            return acc + cvv[j, v] * g

        acc8 = jax.lax.fori_loop(jnp.int32(0), nwv_ref[t], vbody,
                                 jnp.zeros((8, 128), jnp.float32))
        contrib = (acc8[0:2] + acc8[2:4]) + (acc8[4:6] + acc8[6:8])
        rhs = bwin[j] - contrib                       # (2, 128)
        rhs_col = rhs.reshape(1, _S).T                # (S, 1)
        x = jax.lax.dot(invw[j], rhs_col,
                        precision=jax.lax.Precision.HIGHEST)
        xr = x.T.reshape(_SR, 128)
        if P > 1:
            carry[0:(P - 1) * _SR, :] = carry[_SR:P * _SR, :]
        carry[(P - 1) * _SR:P * _SR, :] = xr
        yb[j] = xr
        y_dma(t, j).start()

        @pl.when(t + NB < nb)
        def _():
            start_in(t + NB, j)

    def outer(o, _):
        for j in range(NB):
            step(o * NB + j, j)
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb // NB), outer, 0)
    for j in range(NB):
        y_dma(nb - NB + j, j).wait()


@functools.lru_cache(maxsize=32)
def _build_tri_call(meta_items, interpret, NB=2):
    meta = dict(meta_items)
    nb, P, Wv = meta["nb"], meta["P"], meta["Wv"]
    NB = max(1, min(NB, nb))
    nb_pad = -(-nb // NB) * NB
    kernel = functools.partial(_tri_kernel, nb=nb_pad, P=P, Wv=Wv, NB=NB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # nwv
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((NB, _S, _S), jnp.float32),
                        pltpu.VMEM((NB, Wv, 8, 128), jnp.int16),
                        pltpu.VMEM((NB, Wv, 8, 128), jnp.float32),
                        pltpu.VMEM((NB, _SR, 128), jnp.float32),
                        pltpu.VMEM((P * _SR, 128), jnp.float32),
                        pltpu.VMEM((NB, _SR, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB, 2)),
                        pltpu.SemaphoreType.DMA((NB,)),
                        pltpu.SemaphoreType.DMA((NB,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad * _SR, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 << 20),
        interpret=bool(interpret),
    ), nb_pad


@register("packed_trisolve", "reference")
def packed_trisolve_reference(arrays, meta_items, b):
    """Oracle: the same block recurrence in plain jnp (scan)."""
    meta = dict(meta_items)
    n, nb, P, Wv = meta["n"], meta["nb"], meta["P"], meta["Wv"]
    k = b.shape[1]
    if meta["flip"]:
        b = b[::-1]
    bp = jnp.pad(b.astype(jnp.float32), ((0, nb * _S - n), (0, 0)))
    bp = bp.reshape(nb, _S, k)
    ci = arrays["crossi"].reshape(nb, Wv * 4, 2, 128).astype(jnp.int32)
    cvv = arrays["crossv"].reshape(nb, Wv * 4, 2, 128)

    def stepfn(carry, xs):
        inv_i, ci_i, cv_i, b_i = xs
        win = carry.reshape(P * _S, k)
        g = win[ci_i.reshape(-1)].reshape(Wv * 4, 2, 128, k)
        contrib = (cv_i[..., None] * g).sum(0).reshape(_S, k)
        x_i = inv_i @ (b_i - contrib)
        new = jnp.concatenate([carry[1:], x_i[None]]) if P > 1 \
            else x_i[None]
        return new, x_i

    carry0 = jnp.zeros((P, _S, k), jnp.float32)
    _, xs = jax.lax.scan(stepfn, carry0,
                         (arrays["inv"], ci, cvv, bp))
    x = xs.reshape(nb * _S, k)[:n].astype(b.dtype)
    return x[::-1] if meta["flip"] else x


@register("packed_trisolve", "tpu")
def packed_trisolve_tpu(arrays, meta_items, b, *, interpret=False):
    meta = dict(meta_items)
    n, nb = meta["n"], meta["nb"]
    k = b.shape[1]
    if b.dtype != jnp.float32:
        return packed_trisolve_reference(arrays, meta_items, b)
    call, nb_pad = _build_tri_call(meta_items, interpret)
    pad = nb_pad - nb
    inv = arrays["inv"]
    ci = arrays["crossi"]
    cv = arrays["crossv"]
    nwv = arrays["nwv"]
    if pad:
        eye = jnp.broadcast_to(jnp.eye(_S, dtype=jnp.float32),
                               (pad, _S, _S))
        inv = jnp.concatenate([inv, eye])
        ci = jnp.concatenate(
            [ci, jnp.zeros((pad,) + ci.shape[1:], ci.dtype)])
        cv = jnp.concatenate(
            [cv, jnp.zeros((pad,) + cv.shape[1:], cv.dtype)])
        nwv = jnp.concatenate([nwv, jnp.zeros(pad, nwv.dtype)])

    flip = meta["flip"]

    def one(col):
        if flip:
            col = col[::-1]
        b2 = jnp.pad(col, (0, nb_pad * _S - n)).reshape(-1, 128)
        y = call(nwv, inv, ci, cv, b2)
        x = y.reshape(nb_pad * _S)[:n]
        return x[::-1] if flip else x

    if k == 1:
        return one(b[:, 0])[:, None]
    return jax.lax.map(one, b.T).T
