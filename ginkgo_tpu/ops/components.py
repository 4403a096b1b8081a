"""Shared device primitives.

Analogs of ``core/components/`` (prefix_sum, reduce_array, bitvector,
disjoint_sets, format conversion helpers).  On TPU most of these ARE
single XLA ops — they exist as named functions so algorithm code reads
like the reference and the device mapping is centralized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def prefix_sum_nonnegative(x):
    """Exclusive prefix sum (``prefix_sum_kernels`` analog): out[i] =
    sum(x[:i]); returns (out, total)."""
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), c.dtype), c[:-1]]), c[-1]


def reduce_add_array(x, init=0):
    """``reduce_array`` analog."""
    return jnp.sum(x) + init


def segment_reduce(values, segment_ids, num_segments, op="add"):
    if op == "add":
        return jax.ops.segment_sum(values, segment_ids,
                                   num_segments=num_segments)
    if op == "max":
        return jax.ops.segment_max(values, segment_ids,
                                   num_segments=num_segments)
    if op == "min":
        return jax.ops.segment_min(values, segment_ids,
                                   num_segments=num_segments)
    raise ValueError(f"unknown segment op {op!r}")


class Bitvector:
    """Packed bitset with rank queries (``core/components/bitvector.hpp``):
    device uint32 words + popcount-based rank."""

    def __init__(self, bits):
        bits = jnp.asarray(bits, bool)
        self.size = bits.shape[0]
        pad = (-self.size) % 32
        padded = jnp.pad(bits, (0, pad)).reshape(-1, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        self.words = jnp.sum(padded.astype(jnp.uint32) * weights, axis=1,
                             dtype=jnp.uint32)
        counts = jnp.sum(padded, axis=1, dtype=jnp.int32)
        self.rank_offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    def get(self, i):
        word = self.words[i // 32]
        return ((word >> (jnp.uint32(i) % 32)) & 1).astype(bool)

    def rank(self, i):
        """#set bits strictly before position i."""
        w = i // 32
        off = jnp.uint32(i % 32)
        mask = jnp.where(off == 0, jnp.uint32(0),
                         (jnp.uint32(0xFFFFFFFF) >> (32 - off)))
        partial = _popcount(self.words[w] & mask)
        return self.rank_offsets[w] + partial.astype(jnp.int32)


def _popcount(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


class DisjointSets:
    """Union-find (``core/components/disjoint_sets.hpp``) — host-side, used
    by aggregation/elimination-forest style symbolics."""

    def __init__(self, n):
        self.parent = np.arange(n, dtype=np.int64)
        self.rank = np.zeros(n, np.int8)

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:     # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return ra
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1
        return ra

    def num_sets(self):
        return int(sum(1 for i in range(len(self.parent))
                       if self.find(i) == i))


class RangeMinimumQuery:
    """Sparse-table RMQ (``core/components/range_minimum_query.hpp``):
    O(n log n) build, O(1) min-index queries — host-side (consumed by
    elimination-tree style symbolics)."""

    def __init__(self, values):
        v = np.asarray(values)
        n = v.shape[0]
        levels = max(1, n.bit_length())
        self.v = v
        self.idx = [np.arange(n, dtype=np.int64)]
        for k in range(1, levels):
            half = 1 << (k - 1)
            prev = self.idx[-1]
            if n - (1 << k) + 1 <= 0:
                break
            a = prev[: n - (1 << k) + 1]
            b = prev[half: half + n - (1 << k) + 1]
            self.idx.append(np.where(v[a] <= v[b], a, b))

    def argmin(self, lo: int, hi: int) -> int:
        """Index of the minimum of values[lo:hi] (hi exclusive)."""
        if hi <= lo:
            raise ValueError("empty range")
        span = hi - lo
        k = span.bit_length() - 1
        a = self.idx[k][lo]
        b = self.idx[k][hi - (1 << k)]
        return int(a if self.v[a] <= self.v[b] else b)

    def min(self, lo: int, hi: int):
        return self.v[self.argmin(lo, hi)]


class AddressablePriorityQueue:
    """Min-heap with update-key by handle
    (``core/components/addressable_pq.hpp``) — host-side, used by
    Dijkstra/MC64-style shortest-path symbolics."""

    def __init__(self):
        import heapq
        self._heapq = heapq
        self._heap = []          # (key, seq, handle)
        self._current = {}       # handle -> key
        self._seq = 0

    def insert(self, handle, key):
        self._current[handle] = key
        self._heapq.heappush(self._heap, (key, self._seq, handle))
        self._seq += 1

    update_key = insert          # lazy-deletion update

    def pop_min(self):
        while self._heap:
            key, _, handle = self._heapq.heappop(self._heap)
            if self._current.get(handle) == key:
                del self._current[handle]
                return handle, key
        raise IndexError("empty priority queue")

    def __len__(self):
        return len(self._current)

    def __contains__(self, handle):
        return handle in self._current


def convert_idxs_to_ptrs(idxs, num_rows):
    """Row indices -> CSR row pointers (format_conversion_kernels)."""
    counts = jnp.zeros(num_rows + 1, jnp.int64).at[
        jnp.asarray(idxs) + 1].add(1, mode="drop")
    return jnp.cumsum(counts)


def convert_ptrs_to_idxs(ptrs, nnz):
    """CSR row pointers -> row indices."""
    return jnp.searchsorted(jnp.asarray(ptrs)[1:], jnp.arange(nnz),
                            side="right").astype(jnp.int32)
