"""Double-word float32 ("df64") arithmetic — the f64-on-TPU story.

TPU v5e has no native float64 (SURVEY §7(e); the reference's fp64
configs are ``include/ginkgo/core/base/types.hpp:459-476`` value
types).  This module provides the standard double-double construction
at float32 granularity: a value is an unevaluated sum ``hi + lo`` of
two f32 with |lo| <= ulp(hi)/2, giving ~48 effective mantissa bits
(~1.8e-15 relative) — enough to run the reference's fp64 baseline
configs on-chip:

* error-free transforms: ``two_sum`` (Knuth), ``split``/``two_prod``
  (Dekker — no FMA required, so it lowers to plain XLA mul/add)
* vectorized df64 add/mul/scale
* compensated reductions: ``df64_sum`` / ``df64_dot`` / ``df64_norm2``
  via elementwise error-free transforms + a log2-depth pairwise df64
  tree (jit-friendly: static unrolled halving steps)
* df64 banded SpMV: the DIA layout sums a static number of shifted
  elementwise products, so full df64 accumulation costs one two_prod +
  one df64 add per diagonal — the flagship Poisson configs get
  fp64-quality residuals from f32 hardware
* ``ir_df64``: iterative refinement with the residual evaluated in
  df64 — f32 inner solves converge to ~1e-12 residuals (the classic
  mixed-precision IR equivalence the reference gets from native fp64)

All functions take/return plain f32 arrays (hi, lo) so they compose
with jit/vmap/shard_map like any other kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .registry import register

_SPLIT = jnp.float32(4097.0)        # 2^12 + 1 (f32 has 24 mantissa bits)


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth; no branch)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with 12-bit halves."""
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker; FMA-free)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(xh, xl, yh, yl):
    """df64 + df64 (Dekker add2, ~11 flops)."""
    sh, se = two_sum(xh, yh)
    te = xl + yl + se
    return quick_two_sum(sh, te)


def df_add_f32(xh, xl, y):
    sh, se = two_sum(xh, y)
    return quick_two_sum(sh, xl + se)


def df_neg(xh, xl):
    return -xh, -xl


def df_mul(xh, xl, yh, yl):
    """df64 * df64."""
    ph, pe = two_prod(xh, yh)
    pe = pe + xh * yl + xl * yh
    return quick_two_sum(ph, pe)


def df_mul_f32(xh, xl, y):
    ph, pe = two_prod(xh, y)
    return quick_two_sum(ph, pe + xl * y)


def df_div(xh, xl, yh, yl):
    """df64 / df64 (one Newton correction of the f32 quotient)."""
    q1 = xh / yh
    rh, rl = df_mul_f32(yh, yl, q1)
    rh, rl = df_add(xh, xl, -rh, -rl)
    q2 = (rh + rl) / yh
    return quick_two_sum(q1, q2)


def _pairwise_df(hi, lo):
    """Reduce (m,) df64 arrays to a scalar df64 by halving steps."""
    m = hi.shape[0]
    while m > 1:
        half = (m + 1) // 2
        pad = 2 * half - m
        if pad:
            hi = jnp.concatenate([hi, jnp.zeros(pad, hi.dtype)])
            lo = jnp.concatenate([lo, jnp.zeros(pad, lo.dtype)])
        hi, lo = df_add(hi[:half], lo[:half], hi[half:], lo[half:])
        m = half
    return hi[0], lo[0]


def df64_sum(x_hi, x_lo=None):
    """Compensated sum of an f32 array -> df64 scalar (hi, lo)."""
    x_hi = x_hi.reshape(-1)
    x_lo = (jnp.zeros_like(x_hi) if x_lo is None else x_lo.reshape(-1))
    return _pairwise_df(x_hi, x_lo)


@register("df64_dot", "reference")
@register("df64_dot", "tpu")
def df64_dot(x, y):
    """dot(x, y) of f32 vectors with df64 accumulation (Ogita dot2 with
    a full df64 tree: error ~ u^2 * n * cond).  Registered in both
    tiers: the same XLA program is already the TPU-native form (VPU
    elementwise + log-depth tree)."""
    p, e = two_prod(x.reshape(-1), y.reshape(-1))
    return _pairwise_df(p, e)


@register("df64_norm2", "reference")
@register("df64_norm2", "tpu")
def df64_norm2(x):
    """||x||_2 as a df64 pair (hi, lo) — a single f32 cannot hold a
    better-than-6e-8 result; callers wanting a plain number use
    ``hi + lo`` in f64 or just hi."""
    h, l_ = df64_dot(x, x)
    # sqrt via one Newton step on the f32 sqrt, kept as hi+lo; the
    # square must be error-free (two_prod) or its rounding dominates
    s = jnp.sqrt(h)
    p, e = two_prod(s, s)
    corr = jnp.where(h > 0,
                     ((h - p) - e + l_) / (2 * jnp.maximum(s, 1e-30)),
                     0.0)
    return quick_two_sum(s, corr.astype(jnp.float32))


def df64_dot_df(xh, xl, yh, yl):
    """dot of two df64 vectors."""
    ph, pe = df_mul(xh.reshape(-1), xl.reshape(-1), yh.reshape(-1),
                    yl.reshape(-1))
    return _pairwise_df(ph, pe)


# ---------------------------------------------------------------------------
# df64 banded (DIA) SpMV: y = A @ x with df64 x and df64 accumulation
# ---------------------------------------------------------------------------

def dia_spmv_df64(offsets, dv, n, xh, xl):
    """y_(hi,lo) = A x for a banded matrix given as unblocked (D, n)
    f32 diagonal values (A[i, i+k] = dv[d, i]); per-element cost is one
    two_prod + one df64 add per diagonal — static D, fully vectorized."""
    yh = jnp.zeros(n, jnp.float32)
    yl = jnp.zeros(n, jnp.float32)
    for d, k in enumerate(offsets):
        k = int(k)
        # x shifted: contribution to y[i] is dv[d, i] * x[i + k]
        if k >= 0:
            xs_h = jnp.pad(xh[k:], (0, k))
            xs_l = jnp.pad(xl[k:], (0, k))
        else:
            xs_h = jnp.pad(xh[:k], (-k, 0))
            xs_l = jnp.pad(xl[:k], (-k, 0))
        ph, pe = two_prod(dv[d], xs_h)
        pe = pe + dv[d] * xs_l
        yh, yl = df_add(yh, yl, *quick_two_sum(ph, pe))
    return yh, yl


def csr_spmv_df64(row_idx, col_idx, values, n, xh, xl):
    """General COO/CSR df64 SpMV: per-entry error-free two_prod, hi/lo
    segment sums.  NOTE: the hi segment_sum itself rounds at f32, so
    per-row accumulation error is ~ u * sqrt(row_nnz) (better constant
    than naive f32, not u^2) — full df64 accumulation needs a static
    per-row structure like the banded path above.  Sufficient for IR
    residuals when rows are short; the banded kernel is the
    fp64-quality path."""
    g_h = xh[col_idx]
    g_l = xl[col_idx]
    ph, pe = two_prod(values, g_h)
    pe = pe + values * g_l
    yh = jax.ops.segment_sum(ph, row_idx, num_segments=n + 1,
                             indices_are_sorted=True)[:n]
    # compensation: re-accumulate the residual of the hi sum per row
    # (hi-sum rounding) is not directly recoverable from segment_sum;
    # carry the explicit error terms instead
    yl = jax.ops.segment_sum(pe, row_idx, num_segments=n + 1,
                             indices_are_sorted=True)[:n]
    return quick_two_sum(yh, yl)


# ---------------------------------------------------------------------------
# Iterative refinement with df64 residuals (mixed-precision IR)
# ---------------------------------------------------------------------------

def _banded_parts(A):
    from ..ops.spmv_pallas import unblock_diag_values
    meta = dict(A.band_meta)
    dv = unblock_diag_values(A.diag_values, meta).astype(jnp.float32)
    return tuple(int(k) for k in A.diag_offsets), dv, meta["n"]


def _apply_df64(A, xh, xl):
    n = A.shape[0]
    if getattr(A, "strategy", None) == "banded" \
            and A.diag_values is not None:
        offsets, dv, n_ = _banded_parts(A)
        yh, yl = dia_spmv_df64(offsets, dv, n_, xh, xl)
        if A.tail_rows is not None:
            th, tl = csr_spmv_df64(A.tail_rows, A.tail_cols,
                                   A.tail_vals.astype(jnp.float32), n_,
                                   xh, xl)
            yh, yl = df_add(yh, yl, th, tl)
        return yh, yl
    if getattr(A, "strategy", None) == "packed" \
            and A.pell_vals is not None:
        yh, yl = pell_spmv_df64(A.pell_vals, A.pell_idx, A.pell_qw,
                                A.pell_xbase, A.pell_meta, xh, xl)
        if A.tail_rows is not None:
            th, tl = csr_spmv_df64(A.tail_rows, A.tail_cols,
                                   A.tail_vals.astype(jnp.float32), n,
                                   xh, xl)
            yh, yl = df_add(yh, yl, th, tl)
        return yh, yl
    return csr_spmv_df64(A.row_idx, A.col_idx,
                         A.values.astype(jnp.float32), n, xh, xl)


@functools.partial(jax.jit, static_argnames=("inner_solve", "iterations"))
def _ir_df64_loop(A, b, inner_solve, iterations):
    n = b.shape[0]
    xh = jnp.zeros(n, jnp.float32)
    xl = jnp.zeros(n, jnp.float32)
    hist = []
    for _ in range(iterations):
        ah, al = _apply_df64(A, xh, xl)
        rh, rl = df_add(b, jnp.zeros_like(b), -ah, -al)
        d = inner_solve(A, rh)
        xh, xl = df_add(xh, xl, *quick_two_sum(d, jnp.zeros_like(d)))
        nh, nl = df64_norm2(rh + rl)
        hist.append(nh + nl)
    return (xh, xl), jnp.stack(hist)


def ir_df64(A, b, inner_solve, iterations=4):
    """Solve A x = b to ~df64 residual accuracy with f32 storage and an
    f32 inner solver.  ``inner_solve(A, r) -> d`` must be jittable (a
    partial of e.g. Cg.solve returning .x).  Returns ((xh, xl), hist)
    where hist are the df64-evaluated residual norms per sweep.

    This is the reference's fp64 story on TPU hardware: BASELINE's fp64
    configs run as f32 + df64-residual IR, with the same convergence
    guarantee (residual at working precision^2 ~ 1e-14)."""
    b = jnp.asarray(b, jnp.float32).reshape(-1)
    return _ir_df64_loop(A, b, inner_solve, int(iterations))


# ---------------------------------------------------------------------------
# df64 packed-slot SpMV: full df64 accumulation over the static (Wv, 8)
# slot axes of the windowed-ELL layout (ops/spmv_packed.py) — the
# general-unstructured analog of dia_spmv_df64 (SURVEY §7(e); VERDICT r2
# task 8).  Per element: one two_prod + the log2(Wv*8)-depth df64 tree.
# ---------------------------------------------------------------------------

def pell_spmv_df64(vals, idx, qw, xbase_row, meta_items, xh, xl):
    """y_(hi,lo) = A x for a packed-layout matrix with df64 x and df64
    accumulation.  Same arrays as ``pell_spmv``; f32 values."""
    from .spmv_packed import _pad_x, LANES, _BLOCKS_PER_SB
    meta = dict(meta_items)
    Gs, Wv, n = meta["Gs"], meta["Wv"], meta["n"]
    qw2 = qw.reshape(Gs, _BLOCKS_PER_SB * Wv)
    xph = _pad_x(xh, meta).reshape(-1)
    xpl = _pad_x(xl, meta).reshape(-1)
    i32 = idx.astype(jnp.int32)
    row_abs = (xbase_row[:, None].astype(jnp.int32)
               + 8 * qw2)[:, :, None, None] + (i32 >> 7)
    flat = row_abs * LANES + (i32 & 127)
    v = vals.astype(jnp.float32)
    ph, pe = two_prod(v, xph[flat])
    pe = pe + v * xpl[flat]
    # df64 pairwise tree over the (Wv, 8) slot axes per (sb, block, lane)
    m = _BLOCKS_PER_SB * Wv * 8 // _BLOCKS_PER_SB          # Wv * 8
    ph = ph.reshape(Gs, _BLOCKS_PER_SB, Wv, 8, LANES).reshape(
        Gs, _BLOCKS_PER_SB, m, LANES)
    pe = pe.reshape(Gs, _BLOCKS_PER_SB, m, LANES)
    M = 1 << max(m - 1, 0).bit_length()
    if M != m:
        pad = [(0, 0), (0, 0), (0, M - m), (0, 0)]
        ph = jnp.pad(ph, pad)
        pe = jnp.pad(pe, pad)
    while M > 1:
        M //= 2
        ph, pe = df_add(ph[:, :, :M], pe[:, :, :M],
                        ph[:, :, M:2 * M], pe[:, :, M:2 * M])
    yh = ph[:, :, 0].reshape(Gs * _BLOCKS_PER_SB * LANES)[:n]
    yl = pe[:, :, 0].reshape(Gs * _BLOCKS_PER_SB * LANES)[:n]
    return yh, yl


# ---------------------------------------------------------------------------
# Compensated distributed dot: per-shard Ogita dot2 inside shard_map,
# (hi, lo) pairs combined by psum — fp64-quality global reductions over
# the mesh (SURVEY §7(e); VERDICT r2 task 8 "compensated distributed
# dots").  Error ~ u^2 * (n * cond + P).
# ---------------------------------------------------------------------------

def df64_dot_dist(x, y, mesh, axis="rows"):
    """dot(x, y) of f32 vectors sharded over ``mesh[axis]`` with df64
    accumulation; the P per-shard (hi, lo) partials ride ONE all_gather
    of two scalars and combine in an error-free df64 tree (a plain psum
    would round the hi parts at f32 and forfeit the compensation).
    Returns a replicated df64 scalar (hi, lo)."""
    from jax.sharding import PartitionSpec

    def local_dot(xs, ys):
        h, l_ = df64_dot(xs.reshape(-1), ys.reshape(-1))
        hs = jax.lax.all_gather(h, axis)     # (P,) tiny
        ls = jax.lax.all_gather(l_, axis)
        return _pairwise_df(hs, ls)

    spec = PartitionSpec(axis) if x.ndim == 1 \
        else PartitionSpec(axis, *([None] * (x.ndim - 1)))
    # check_vma=False: the df64 tree's replication over the gathered
    # (P,) partials is manual; verified vs the serial oracle in tests
    return jax.shard_map(local_dot, mesh=mesh, in_specs=(spec, spec),
                         out_specs=(PartitionSpec(), PartitionSpec()),
                         check_vma=False)(x, y)
