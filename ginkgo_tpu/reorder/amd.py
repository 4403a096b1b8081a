"""Approximate minimum degree reordering.

Analog of ``include/ginkgo/core/reorder/amd.hpp:36`` /
``core/reorder/amd.cpp`` (itself a reimplementation of SuiteSparse AMD).

Primary path: the native C++ quotient-graph AMD (``gt_amd_order``) —
eliminated pivots become elements, approximate external degrees via the
one-pass |Le \\ Lp| trick, supervariable merging by adjacency hashing,
aggressive element absorption (the Amestoy-Davis-Duff algorithm, so
n=100k orders in seconds).  Fallback: exact minimum degree on the
elimination graph (Python sets; small matrices only).
"""

from __future__ import annotations

import numpy as np

from ..matrix.permutation import Permutation


def amd_ordering(data) -> np.ndarray:
    d = data.canonical()
    n = d.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    from ..native import amd_order_native
    # symmetrized pattern without the diagonal, CSR-style
    r = d.row_idx.astype(np.int64)
    c = d.col_idx.astype(np.int64)
    off = r != c
    rr = np.concatenate([r[off], c[off]])
    cc = np.concatenate([c[off], r[off]])
    key = rr * n + cc
    key = np.unique(key)
    rr, cc = key // n, key % n
    ptr = np.searchsorted(rr, np.arange(n + 1)).astype(np.int64)
    perm = amd_order_native(n, ptr, cc)
    if perm is not None:
        return perm
    return _md_ordering_python(d)


def _md_ordering_python(d) -> np.ndarray:
    n = d.shape[0]
    adj = [set() for _ in range(n)]
    for i, j in zip(d.row_idx, d.col_idx):
        i, j = int(i), int(j)
        if i != j:
            adj[i].add(j)
            adj[j].add(i)
    alive = np.ones(n, bool)
    order = []
    import heapq
    heap = [(len(adj[v]), v) for v in range(n)]
    heapq.heapify(heap)
    while len(order) < n:
        deg, v = heapq.heappop(heap)
        if not alive[v] or deg != len(adj[v]):
            continue   # stale entry
        alive[v] = False
        order.append(v)
        nbrs = [u for u in adj[v] if alive[u]]
        # eliminate v: clique its neighbors
        for u in nbrs:
            adj[u].discard(v)
            for w in nbrs:
                if w != u:
                    adj[u].add(w)
            heapq.heappush(heap, (len(adj[u]), u))
    return np.asarray(order, np.int64)


class Amd:
    """Factory: ``Amd.build().generate(A)`` -> Permutation."""

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> Permutation:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        return Permutation.from_indices(amd_ordering(data))
