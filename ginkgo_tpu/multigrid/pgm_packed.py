"""Device-resident PGM aggregation for general unstructured matrices.

The reference aggregates on device for ANY pattern
(``common/cuda_hip/multigrid/pgm_kernels.cpp``: find_strongest_neighbor
/ match_edge / assign_to_exist_agg); ``pgm_dia.py`` covers the
diagonal-structured class with slab mask algebra.  This module is the
same Luby-style matching over a padded ELL layout: per-row neighbor
lists (n, W) with a validity mask, strongest-neighbor as a row argmax,
the mutual check as one gather, size-capped leftover attachment — ONE
jitted device loop (early-exiting while_loop on the unmatched count).
Same algorithm and symmetric per-edge hash tiebreak
as the DIA kernel, so aggregate quality matches; tie patterns can
differ from the host path's tiebreak (quality-equivalent, pinned by
tests).

Host cost is one scipy symmetrization + ELL padding (O(nnz log nnz));
device cost is ~2 gathers per edge per round.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

_MAX_W = 64         # padded neighbors per row; weak tails truncated


@partial(jax.jit, static_argnames=("n", "W"))
def _ell_build(rows, cols, slot, vals, n, W):
    """Scatter the CSR triple into the padded (n, W) ELL layout on
    device (shipping the padded layout through a slow host link costs
    W/deg x more than the CSR-sized arrays)."""
    import jax.numpy as jnp
    dest = rows.astype(jnp.int32) * W + slot.astype(jnp.int32)
    J = jnp.zeros((n * W,), jnp.int32).at[dest].set(cols)
    Wv = jnp.zeros((n * W,), jnp.float32).at[dest].set(vals)
    valid = jnp.zeros((n * W,), bool).at[dest].set(True)
    return J.reshape(n, W), Wv.reshape(n, W), valid.reshape(n, W)


@partial(jax.jit, static_argnames=("iters", "attach_iters", "cap"))
def _pgm_match_packed(J, Wv, valid, iters, attach_iters, cap):
    """root[i] = representative fine row of i's aggregate (or i).
    ``J``/``Wv``/``valid``: (n, W) padded neighbor columns, weights,
    slot validity."""
    import jax.numpy as jnp
    from jax import lax
    n, W = J.shape
    i = lax.iota(jnp.int32, n)
    Jc = jnp.clip(J, 0, n - 1)
    # symmetric per-edge jitter (same value seen from both endpoints)
    lo = jnp.minimum(i[:, None], Jc).astype(jnp.uint32)
    hi = jnp.maximum(i[:, None], Jc).astype(jnp.uint32)
    h = (lo * jnp.uint32(2654435761)) ^ (hi * jnp.uint32(2246822519))
    h = (h ^ (h >> 15)) * jnp.uint32(0x85EBCA6B)
    u01 = (h >> 9).astype(jnp.float32) * jnp.float32(2.0 ** -23)
    key = Wv.astype(jnp.float32) * (jnp.float32(1.0)
                                    + u01 * jnp.float32(2.0 ** -12))
    key = jnp.where(valid & (Wv > 0), key, -jnp.ones((), jnp.float32))

    def strongest(mask):
        """Per-vertex strongest active slot: (partner, has_partner)."""
        k2 = jnp.where(mask, key, -jnp.ones((), jnp.float32))
        s = jnp.argmax(k2, axis=1)                        # (n,)
        best = jnp.take_along_axis(k2, s[:, None], axis=1)[:, 0]
        p = jnp.take_along_axis(Jc, s[:, None], axis=1)[:, 0]
        return p, best > 0

    def match_round(carry):
        rnd, root = carry
        free = root < 0
        p, has = strongest(free[:, None] & free[Jc])
        pp = jnp.where(has, p, i)
        mutual = has & (pp[pp] == i)
        newroot = jnp.where(mutual, jnp.minimum(i, pp), root)
        return rnd + 1, jnp.where(free, newroot, root)

    # early exit once <5% of vertices remain unmatched (the host
    # path's max_unassigned_ratio): Luby matching converges in ~8
    # rounds; fixed trips paid 2x the gathers for nothing
    def match_more(carry):
        rnd, root = carry
        return (rnd < iters) & (jnp.sum(root < 0) > n // 20)

    _, root = lax.while_loop(match_more, match_round,
                             (jnp.int32(0), jnp.full(n, -1, jnp.int32)))

    def attach_round(_, root):
        assigned = root >= 0
        rc = jnp.where(assigned, root, 0)
        sizes = jnp.zeros(n, jnp.int32).at[rc].add(
            assigned.astype(jnp.int32))
        aj = assigned[Jc]
        ok_j = aj & (sizes[jnp.where(aj, root[Jc], 0)] < cap)
        p, has = strongest((~assigned)[:, None] & ok_j)
        return jnp.where(~assigned & has, root[p], root)

    root = lax.fori_loop(0, attach_iters, attach_round, root)
    return jnp.where(root < 0, i, root)


def aggregate_packed(d, max_iterations: int = 15, max_agg_size: int = 8):
    """Device PGM aggregation over the padded ELL neighbor layout;
    returns root-per-row (not renumbered) or None when a row exceeds
    the width cap."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    n = d.shape[0]
    if n < 4 or d.nnz == 0:
        return None
    off = d.row_idx != d.col_idx
    w = sp.csr_matrix((np.abs(d.values[off]).astype(np.float64),
                       (d.row_idx[off], d.col_idx[off])), shape=(n, n))
    w = ((w + w.T) * 0.5).tocsr()
    deg = np.diff(w.indptr)
    W = int(deg.max()) if n else 0
    if W == 0:
        return None
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    data = w.data
    cols_k = w.indices
    if W > _MAX_W:
        # heavy rows (boundary clusters): keep each row's _MAX_W
        # strongest edges — matching only ever uses the strongest
        # active neighbor, so truncating the weak tail is benign
        order = np.lexsort((-np.abs(data), rows))
        rows, cols_k, data = rows[order], cols_k[order], data[order]
        # strongest-first position within each row (row grouping and
        # per-row counts are unchanged by the in-row reorder)
        slot = np.arange(w.nnz) - np.repeat(w.indptr[:-1], deg)
        keep = slot < _MAX_W
        rows, slot = rows[keep], slot[keep]
        cols_k, data = cols_k[keep], data[keep]
        W = _MAX_W
    else:
        slot = np.arange(w.nnz) - np.repeat(w.indptr[:-1], deg)
    from ..utils import stagetimer
    with stagetimer.stage("transfer"):
        args = stagetimer.sync(tuple(jnp.asarray(a) for a in (
            rows.astype(np.int32), cols_k.astype(np.int32),
            slot.astype(np.int32), data.astype(np.float32))))
    with stagetimer.stage("device"):
        J, Wv, valid = _ell_build(*args, n=n, W=W)
        root = stagetimer.sync(_pgm_match_packed(
            J, Wv, valid, iters=int(max_iterations), attach_iters=4,
            cap=int(max_agg_size)))
    return np.asarray(root).astype(np.int64)
