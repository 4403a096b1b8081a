"""Device-resident PGM aggregation for diagonal-structured matrices.

The reference runs aggregation on the device
(``common/cuda_hip/multigrid/pgm_kernels.cpp``: match_edge /
find_strongest_neighbor / assign_to_exist_agg); the host path in
``pgm.py`` is edge-list numpy.  For matrices with few diagonal offsets
the whole Luby-style matching runs as mask algebra on (num_offs, n)
slabs — strongest-neighbor is an argmax over the offset axis, the
mutual check is one gather, and leftover attachment reuses the same
argmax with a segment-sum size cap — ONE jitted fori_loop, no edge
lists, no sorts.

Same algorithm as the host path (mutual-strongest matching with a
symmetric per-edge hash tiebreak, size-capped leftover attachment,
first-appearance renumbering); tie-break hashes differ, so aggregates
can differ at ties — quality-equivalent, pinned by tests.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np


def plan_offsets(d, cap: int = 64):
    """Symmetric off-diagonal offset set of A, or None if unstructured."""
    n, m = d.shape
    if n != m or d.nnz == 0 or n < 4:
        return None
    off = np.unique(d.col_idx.astype(np.int64) - d.row_idx)
    off = off[off != 0]
    offs = np.unique(np.concatenate([off, -off]))
    offs = offs[(offs > -n) & (offs < n)]
    if offs.size == 0 or offs.size > cap:
        return None
    return offs


@partial(jax.jit, static_argnames=("iters", "attach_iters", "cap"))
def _pgm_match_kernel(W, offs, iters, attach_iters, cap):
    """root[i] = representative fine row of i's aggregate (or i)."""
    import jax.numpy as jnp
    from jax import lax
    ND, n = W.shape
    i = lax.iota(jnp.int32, n)
    J = i[None, :] + offs[:, None].astype(jnp.int32)      # (ND, n)
    inb = (J >= 0) & (J < n)
    Jc = jnp.clip(J, 0, n - 1)
    # symmetric per-edge jitter (same value seen from both endpoints)
    lo = jnp.minimum(i[None, :], Jc).astype(jnp.uint32)
    hi = jnp.maximum(i[None, :], Jc).astype(jnp.uint32)
    h = (lo * jnp.uint32(2654435761)) ^ (hi * jnp.uint32(2246822519))
    h = (h ^ (h >> 15)) * jnp.uint32(0x85EBCA6B)
    u01 = (h >> 9).astype(jnp.float32) * jnp.float32(2.0 ** -23)
    key = W.astype(jnp.float32) * (jnp.float32(1.0)
                                   + u01 * jnp.float32(2.0 ** -12))
    key = jnp.where(inb & (W > 0), key, -jnp.ones((), jnp.float32))

    def strongest(mask):
        """Per-vertex strongest active slot: (partner, has_partner)."""
        k2 = jnp.where(mask, key, -jnp.ones((), jnp.float32))
        s = jnp.argmax(k2, axis=0)                        # (n,)
        best = jnp.take_along_axis(k2, s[None, :], axis=0)[0]
        p = jnp.take_along_axis(Jc, s[None, :], axis=0)[0]
        return p, best > 0

    def match_round(_, root):
        free = root < 0
        p, has = strongest(free[None, :] & free[Jc])
        pp = jnp.where(has, p, i)
        mutual = has & (pp[pp] == i)
        newroot = jnp.where(mutual, jnp.minimum(i, pp), root)
        return jnp.where(free, newroot, root)

    root = lax.fori_loop(0, iters, match_round,
                         jnp.full(n, -1, jnp.int32))

    def attach_round(_, root):
        assigned = root >= 0
        rc = jnp.where(assigned, root, 0)
        sizes = jnp.zeros(n, jnp.int32).at[rc].add(
            assigned.astype(jnp.int32))
        ok_j = assigned[Jc] & (sizes[jnp.where(assigned[Jc],
                                               root[Jc], 0)] < cap)
        p, has = strongest((~assigned)[None, :] & ok_j)
        return jnp.where(~assigned & has, root[p], root)

    root = lax.fori_loop(0, attach_iters, attach_round, root)
    return jnp.where(root < 0, i, root)


@jax.jit
def _symmetrize(slab, qneg, offs):
    """0.5 * (|A| + |A|ᵀ) on the slab (transpose = row swap + shift)."""
    from ..factorization.par_ilut_dia import _shift
    n = slab.shape[1]
    mirror = jax.vmap(lambda qn, o: _shift(slab[qn], o, n))(qneg, offs)
    return 0.5 * (slab + mirror)


def aggregate_dia(d, max_iterations: int = 15, max_agg_size: int = 8):
    """Device PGM aggregation; returns root-per-row (not renumbered)
    or None when the matrix is not diagonal-structured."""
    offs = plan_offsets(d)
    if offs is None:
        return None
    import jax.numpy as jnp
    from ..factorization.par_ilut_dia import _dia_slab_device
    n = d.shape[0]
    ND = offs.size
    # |A| off-diagonal slab, then symmetrize on the slab:
    # |Aᵀ|[i, i+o] = |A|[i+o, i] = slab[q(-o), i+o]  (a shift)
    doff = d.col_idx.astype(np.int64) - d.row_idx
    keep = doff != 0
    p = np.searchsorted(offs, doff[keep]).astype(np.int32)
    absvals = np.abs(d.values[keep]).astype(np.float32)
    slab = _dia_slab_device(jnp.asarray(absvals), jnp.asarray(p),
                            jnp.asarray(d.row_idx[keep].astype(np.int32)),
                            ND, n)
    qneg = np.searchsorted(offs, -offs).astype(np.int32)   # exact by symmetry
    W = _symmetrize(slab, jnp.asarray(qneg), jnp.asarray(offs))
    root = _pgm_match_kernel(W, jnp.asarray(offs),
                             iters=int(max_iterations),
                             attach_iters=4, cap=int(max_agg_size))
    return np.asarray(root).astype(np.int64)
