"""Device-resident ParILUT for diagonal-structured matrices.

The reference runs the whole ParILUT loop on the device
(``common/cuda_hip/factorization/par_ilut_{spgeam,select,filter,sweep}_
kernels.cpp``, driver ``core/factorization/par_ilut.cpp:262-350``) with
per-iteration reallocation.  Dynamic-size pattern evolution is the one
thing XLA cannot express, so the TPU-native reformulation fixes the
*shape universe* up front and lets the pattern evolve as a mask:

* L and U live as dense **diagonal (DIA) slabs** ``(num_diags, n)`` —
  the same layout the banded SpMV roofline kernel uses.  A structured
  matrix (stencil/banded, the class where TPUs win) has few diagonals.
* The product ``(I+L)@U`` restricted to diagonals is exact and
  gather-free: for offsets ``ol + ou = oc``,
  ``C[oc, i] += L[ol, i] * U[ou, i+ol]`` — a *static shift* and an
  elementwise MAC, pure VPU work (one ``lax.scan`` over the lower
  offsets).
* ``add_candidates`` = the union mask of A's pattern and the product
  pattern (same scan, OR instead of MAC).
* ``threshold_select`` = exact k-th largest magnitude via one on-device
  sort of the masked slab (the reference's sampleselect is an
  approximation of the same quantity).
* ``threshold_filter`` = a mask update; no compaction, no reallocation.
* Chow-Patel **sweeps** are the elementwise Jacobi updates
  ``l += (A - LU)/u_jj``, ``u += (A - LU)`` on the masked slabs.  The
  initial L is diagonally scaled (``l0 = a_ij/a_jj``, Chow & Patel's
  standard start) — the synchronous/Jacobi form of the fixed point
  diverges from the unscaled start (measured: 1e9 residual blowup in
  8 sweeps on the 27-pt stencil; scaled start contracts ~3x/sweep).

The *offset universe* is the two-level closure of A's offsets
(``OA ∪ (OL⊕OU) ∪ ((OL⊕OU)⊕(OL⊕OU))``), capped; fill falling outside
it is dropped (it is the furthest-from-diagonal, smallest-magnitude
fill).  With the universe fixed, EVERY outer iteration has identical
shapes, so the whole generate — candidates, select, filter, sweeps,
``iterations`` times — is ONE jitted ``fori_loop`` with zero host
round-trips; the host only extracts A's diagonals before and compacts
the masked result after.

Falls back (returns None) for matrices that are not
diagonal-structured; ``ParIlut(algorithm=...)`` routes.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np


def plan_dia(d, *, cap: int = 384, max_slots: int = 200_000_000):
    """Offset-universe plan for the device ParILUT, or None when the
    matrix is not diagonal-structured enough to pay.

    Returns dict(universe=int64[ND] ascending (0 included), n_low=int).
    """
    n, m = d.shape
    if n != m or d.nnz == 0 or n < 2:
        return None
    oa = np.unique(d.col_idx.astype(np.int64) - d.row_idx.astype(np.int64))
    if oa.size > 64:                      # not diagonal-structured
        return None
    tier0 = np.union1d(oa, [0])
    lo0 = tier0[tier0 < 0]
    up0 = tier0[tier0 >= 0]
    s1 = np.unique(lo0[:, None] + up0[None, :]).ravel()
    lo1 = np.union1d(lo0, s1[s1 < 0])
    up1 = np.union1d(up0, s1[s1 >= 0])
    s2 = np.unique(lo1[:, None] + up1[None, :]).ravel()
    universe = np.union1d(np.union1d(tier0, s1), s2)
    universe = universe[(universe > -n) & (universe < n)]
    if universe.size > cap:
        # priority: A's offsets, then level-1 fill, then level-2, each
        # tier by |offset| ascending (closest-to-diagonal first)
        tiers = (tier0, np.setdiff1d(s1, tier0),
                 np.setdiff1d(s2, np.union1d(s1, tier0)))
        chosen = []
        room = cap
        for t in tiers:
            t = t[(t > -n) & (t < n)]
            if t.size > room:
                t = t[np.argsort(np.abs(t), kind="stable")[:room]]
            chosen.append(t)
            room -= t.size
            if room <= 0:
                break
        universe = np.unique(np.concatenate(chosen))
    if tier0.size > cap or universe.size * n > max_slots:
        return None
    return {"universe": universe.astype(np.int64),
            "n_low": int((universe < 0).sum())}


def _dia_slab(d, universe, dtype):
    """A's values scattered onto the (ND, n) diagonal slab (host)."""
    n = d.shape[0]
    slab = np.zeros((universe.size, n), dtype)
    off = d.col_idx.astype(np.int64) - d.row_idx
    p = np.searchsorted(universe, off)
    slab[p, d.row_idx] = d.values
    return slab


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _shift(x, s, n):
    """y[..., i] = x[..., i+s] for 0 <= i+s < n, else 0 (s traced)."""
    import jax.numpy as jnp
    from jax import lax
    y = jnp.roll(x, -s, axis=-1)
    i = lax.iota(jnp.int32, n)
    ok = (i + s >= 0) & (i + s < n)
    return jnp.where(ok, y, jnp.zeros((), y.dtype))


def _product(V, M, ols, tmap, n_low, want_mask):
    """C = (I+L)@U on the slab; optionally the product pattern mask.

    V: (ND, n) values (inactive slots MUST be zero), M: (ND, n) uint8.
    ols: (n_low,) offsets; tmap: (n_low, n_up) target row in [0, ND]
    (ND = dropped).  Rows [0, n_low) are strictly-lower offsets, row
    n_low is the main diagonal, the rest upper.
    """
    import jax.numpy as jnp
    from jax import lax
    ND, n = V.shape
    VU, MU = V[n_low:], M[n_low:]
    C0 = jnp.zeros((ND + 1, n), V.dtype).at[n_low:ND].set(VU)
    Cm0 = jnp.zeros((ND + 1, n), jnp.uint8).at[n_low:ND].set(MU)

    def body(carry, xs):
        C, Cm = carry
        vl, ml, t, ol = xs
        ush = _shift(VU, ol, n)
        C = C.at[t].add(vl[None, :] * ush)
        if want_mask:
            msh = _shift(MU, ol, n)
            Cm = Cm.at[t].max(ml[None, :] * msh)
        return (C, Cm), None

    (C, Cm), _ = lax.scan(body, (C0, Cm0),
                          (V[:n_low], M[:n_low], tmap, ols))
    return C[:ND], Cm[:ND]


def _lower_den(V, ols, n_low):
    """u_jj aligned to each lower diagonal: den[a, i] = u[i+ol_a, i+ol_a]."""
    import jax
    import jax.numpy as jnp
    n = V.shape[1]
    udiag = V[n_low]
    if ols.shape[0] == 0:
        return jnp.zeros((0, n), V.dtype)
    D = jax.vmap(lambda o: _shift(udiag, o, n))(ols)
    return jnp.where(D == 0, jnp.ones((), D.dtype), D)


def _topk_mask(mag, active, k):
    """Exact top-k mask of mag over active slots (k static).  Ties are
    broken by slab position (argsort order), so the kept count is
    EXACTLY min(k, #active) — a magnitude threshold would keep every
    tie, blowing the fill budget on stencils where magnitudes repeat.
    The reference's sampleselect threshold has the same tie overshoot;
    exact-k is the stronger contract and is one device sort here."""
    import jax.numpy as jnp
    flat = jnp.where(active.astype(bool), mag,
                     -jnp.ones((), mag.dtype)).ravel()
    if k <= 0:
        return jnp.zeros(mag.shape, jnp.uint8)
    if k >= flat.size:
        return active.astype(jnp.uint8)
    idx = jnp.argsort(-flat)
    keep = jnp.zeros(flat.size, bool).at[idx[:k]].set(True)
    keep &= flat >= 0                     # never resurrect inactive slots
    return keep.reshape(mag.shape).astype(jnp.uint8)


@partial(
    jax.jit,
    static_argnames=("n_low", "iterations", "sweeps", "keep_l", "keep_u"))
def _run_dia(AV, ols, tmap, n_low, iterations, sweeps, keep_l, keep_u):
    """The whole ParILUT loop on device: init sweeps + ``iterations`` x
    (candidates -> select -> filter -> sweeps).  Returns (V, M)."""
    import jax.numpy as jnp
    from jax import lax
    Am = (AV != 0).astype(jnp.uint8).at[n_low].set(1)

    def sweep_block(V, M, count):
        for _ in range(count):
            C, _ = _product(V, M, ols, tmap, n_low, want_mask=False)
            R = AV - C
            D = _lower_den(V, ols, n_low)
            upd = jnp.concatenate([R[:n_low] / D, R[n_low:]], axis=0)
            V = jnp.where(M.astype(bool), V + upd, jnp.zeros((), V.dtype))
        return V

    def iteration(_, carry):
        V, M = carry
        # 1+2. product + add_candidates + Jacobi seed on the union
        C, Cm = _product(V, M, ols, tmap, n_low, want_mask=True)
        cand = jnp.maximum(Cm, Am)
        R = AV - C
        D = _lower_den(V, ols, n_low)
        upd = jnp.concatenate([R[:n_low] / D, R[n_low:]], axis=0)
        V2 = jnp.where(cand.astype(bool), V + upd, jnp.zeros((), V.dtype))
        # 3+4. select + filter: exact top-k by magnitude per factor
        # (diagonal pinned to +inf so it is always kept within budget)
        mag = jnp.abs(V2)
        mag_u = mag[n_low:].at[0].set(jnp.inf)
        M3 = jnp.concatenate(
            [_topk_mask(mag[:n_low], cand[:n_low], keep_l),
             _topk_mask(mag_u, cand[n_low:], keep_u)], axis=0)
        M3 = M3.at[n_low].set(1)
        V3 = V2 * M3
        # 5. sweeps on the filtered pattern
        V3 = sweep_block(V3, M3, sweeps)
        return V3, M3

    udiag0 = AV[n_low]
    den0 = jax.vmap(lambda o: _shift(udiag0, o, AV.shape[1]))(ols)
    den0 = jnp.where(den0 == 0, jnp.ones((), AV.dtype), den0)
    V0 = jnp.concatenate([AV[:n_low] / den0, AV[n_low:]], axis=0) * Am
    V0 = sweep_block(V0, Am, 3)
    return lax.fori_loop(0, iterations, iteration, (V0, Am))


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def generate_dia(d, iterations, fill_in_limit, sweeps, *, cap=384):
    """Run the device-resident ParILUT; returns
    (lr, lc, lv, ur, uc, uv) split arrays (L strictly lower) or None
    when the matrix is not diagonal-structured."""
    plan = plan_dia(d, cap=cap)
    if plan is None:
        return None
    import jax.numpy as jnp
    from jax import dtypes
    universe, n_low = plan["universe"], plan["n_low"]
    n = d.shape[0]
    ND = universe.size
    # build the slab directly in the device dtype (f64 -> f32 when x64
    # is off): half the host memory and half the transfer
    cdtype = dtypes.canonicalize_dtype(d.values.dtype)
    AVh = _dia_slab(d, universe, cdtype)
    AV = jnp.asarray(AVh)

    # static budgets from A's split pattern (diag always present in U)
    low = d.row_idx > d.col_idx
    nnz_l0 = int(low.sum())
    nnz_u0 = int((~low & (d.values != 0)).sum())
    nnz_u0 += n - int(((d.row_idx == d.col_idx) & (d.values != 0)).sum())
    keep_l = int(np.ceil(fill_in_limit * max(nnz_l0, 1)))
    keep_u = int(np.ceil(fill_in_limit * max(nnz_u0, 1)))

    ols = jnp.asarray(universe[:n_low])
    up = universe[n_low:]
    targets = universe[:n_low, None] + up[None, :]
    tpos = np.searchsorted(universe, targets)
    tpos_c = np.minimum(tpos, ND - 1)
    tmap = np.where(universe[tpos_c] == targets, tpos_c, ND)
    tmap = jnp.asarray(tmap.astype(np.int32))

    V, M = _run_dia(AV, ols, tmap, n_low, int(iterations), int(sweeps),
                    keep_l, keep_u)
    Vh = np.asarray(V)
    Mh = np.asarray(M)
    # compact in slab (C) order — Csr.from_data canonicalizes, so COO
    # order is free and flatnonzero beats the transposed nonzero ~30x
    flat = np.flatnonzero(Mh)
    p, r = np.divmod(flat, n)
    off = universe[p]
    c = r + off
    v = Vh.reshape(-1)[flat]
    lowm = off < 0
    return (r[lowm], c[lowm], v[lowm],
            r[~lowm], c[~lowm], v[~lowm])
