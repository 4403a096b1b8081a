"""Approximate minimum degree reordering.

Analog of ``include/ginkgo/core/reorder/amd.hpp:36`` /
``core/reorder/amd.cpp`` (itself a reimplementation of SuiteSparse AMD).
This is a straightforward minimum-degree ordering on the elimination graph
(exact degrees, clique update) — same fill-reduction goal, host-side.
"""

from __future__ import annotations

import numpy as np

from ..matrix.permutation import Permutation


def amd_ordering(data) -> np.ndarray:
    d = data.canonical()
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
