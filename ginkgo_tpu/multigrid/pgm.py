"""PGM — parallel graph match aggregation (AMG coarsening).

Analog of ``include/ginkgo/core/multigrid/pgm.hpp:51`` /
``core/multigrid/pgm.cpp:187-260`` (kernels find_strongest_neighbor,
match_edge, count_unagg, assign_to_exist_agg, renumber) and the
sort-reduce Galerkin product ``generate_coarse`` (pgm.cpp:93-152).

Aggregation is generate-time graph work → host numpy.  The resulting level
operators are device LinOps: prolongation = gather by aggregate id,
restriction = segment-sum by aggregate id (unsmoothed aggregation, P
entries = 1), coarse operator = index-map + sum-duplicates (RᵀAP as one
sort-reduce, SURVEY.md A.6) — all static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..matrix.csr import Csr


@linop_dataclass
class AggProlong(LinOp):
    """x_fine = x_coarse[agg] — unsmoothed-aggregation prolongation.

    ``op`` optionally holds the same map as a fast-layout Csr (the P
    matrix): XLA's gather is ~7 ns/element on TPU, which made the
    transfer operators dominate the V-cycle at scale; as a packed/banded
    SpMV the transfer runs at stream speed."""

    agg: jnp.ndarray                      # (n_fine,) aggregate id per row
    num_coarse: int = static_field()
    op: object = None

    @property
    def shape(self):
        return (self.agg.shape[0], self.num_coarse)

    def _apply(self, b):
        if self.op is not None:
            return self.op._apply(b)
        return b[self.agg]


@linop_dataclass
class AggRestrict(LinOp):
    """x_coarse = segment_sum(x_fine, agg) — Pᵀ."""

    agg: jnp.ndarray
    num_coarse: int = static_field()
    op: object = None

    @property
    def shape(self):
        return (self.num_coarse, self.agg.shape[0])

    def _apply(self, b):
        if self.op is not None:
            return self.op._apply(b)
        return jax.ops.segment_sum(b, self.agg,
                                   num_segments=self.num_coarse)


def _coarse_csr(coarse_data: MatrixData) -> Csr:
    """Coarse Galerkin operator on the fastest accepted layout: automatical
    (banded/packed within economy caps) with an explicit-packed retry —
    aggregation densifies rows, which pushes mid-level pad ratios just
    past the automatical cap while the packed stream still beats the
    gather tier by orders of magnitude."""
    C = Csr.from_data(coarse_data, strategy="automatical")
    if C.strategy == "classical" and coarse_data.nnz >= (1 << 14):
        C2 = Csr.from_data(coarse_data, strategy="packed")
        if C2.strategy == "packed":
            return C2
    return C


def _agg_transfer_ops(agg: np.ndarray, nc: int):
    """(P, R) as packed-strategy Csr operators, or (None, None) when
    the fast layouts reject the pattern (classical would just re-gather)."""
    n = agg.shape[0]
    if n < (1 << 13):
        return None, None
    rows = np.arange(n, dtype=np.int64)
    cols = np.asarray(agg, np.int64)
    ones = np.ones(n)
    # explicit 'packed': a one-entry-per-row transfer pads ~8x in the
    # slot layout, but the padded stream still beats the gather tier by
    # ~100x at these sizes
    P = Csr.from_data(MatrixData((n, nc), rows, cols, ones),
                      strategy="packed")
    R = Csr.from_data(MatrixData((nc, n), cols, rows, ones),
                      strategy="packed")
    if P.strategy == "classical" and R.strategy == "classical":
        return None, None
    return (P if P.strategy != "classical" else None,
            R if R.strategy != "classical" else None)


@linop_dataclass
class MultigridLevel(LinOp):
    """(fine op, prolong, restrict, coarse op) bundle
    (``multigrid_level.hpp`` EnableMultigridLevel)."""

    fine_op: LinOp
    prolong: LinOp
    restrict: LinOp
    coarse_op: LinOp

    @property
    def shape(self):
        return self.fine_op.shape

    def _apply(self, b):
        return self.fine_op._apply(b)


def _renumber(agg: np.ndarray, n: int) -> np.ndarray:
    """Dense ids in fine-row-first-appearance order: ids in matching
    order are spatially scattered, which strips the coarse Galerkin
    operator (and P/R) of the column locality the banded/packed layouts
    need — with first-appearance ordering a banded fine matrix stays
    banded on every coarse level."""
    uniq, inv = np.unique(agg, return_inverse=True)
    first = np.full(uniq.size, n, np.int64)
    np.minimum.at(first, inv, np.arange(n))
    rank = np.empty(uniq.size, np.int64)
    rank[np.argsort(first, kind="stable")] = np.arange(uniq.size)
    return rank[inv].astype(np.int64)


def pgm_aggregate(data: MatrixData, max_iterations: int = 15,
                  max_unassigned_ratio: float = 0.05,
                  deterministic: bool = True, seed: int = 0,
                  algorithm: str = "auto") -> np.ndarray:
    """Size-2 mutual-strongest-edge aggregation. Returns agg id per row."""
    import scipy.sparse as sp
    d = data.canonical()
    n = d.shape[0]

    # device matching: DIA slabs for diagonal-structured matrices
    # (pgm_dia.py), padded-ELL for general unstructured (pgm_packed.py)
    if algorithm not in ("auto", "dia", "packed", "general"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm != "general" and deterministic:
        import jax
        accel = jax.default_backend() != "cpu"
        if algorithm == "dia" or (algorithm == "auto" and accel
                                  and n >= 16384):
            from .pgm_dia import aggregate_dia
            root = aggregate_dia(d, max_iterations)
            if root is not None:
                return _renumber(root, n)
        if algorithm == "packed" or (algorithm == "auto" and accel
                                     and n >= 16384):
            from .pgm_packed import aggregate_packed
            root = aggregate_packed(d, max_iterations)
            if root is not None:
                return _renumber(root, n)
    # symmetrised off-diagonal weight matrix (pgm.cpp builds 0.5(A+Aᵀ))
    off = d.row_idx != d.col_idx
    w = sp.csr_matrix((np.abs(d.values[off]),
                       (d.row_idx[off], d.col_idx[off])), shape=(n, n))
    w = (w + w.T) * 0.5
    w = w.tocsr()
    wc = w.tocoo()
    e_rows = wc.row.astype(np.int64)
    e_cols = wc.col.astype(np.int64)
    e_vals = wc.data

    def _strongest(rows, cols, row_ok, col_ok):
        """Per-row argmax over edges with row_ok[row] & col_ok[col].  The
        edge list is presorted ONCE by (row asc, value desc, tiebreak asc)
        below, and boolean compaction preserves that order — so each round
        is just a mask + first-occurrence-per-row scan, no per-round sort
        (the former per-round lexsort dominated AMG generate at n=262k)."""
        keep = row_ok[rows] & col_ok[cols]
        r, c = rows[keep], cols[keep]
        out = np.full(n, -1, np.int64)
        if r.size == 0:
            return out
        first = np.empty(r.size, bool)
        first[0] = True
        np.not_equal(r[1:], r[:-1], out=first[1:])
        out[r[first]] = c[first]
        return out

    # SYMMETRIC per-edge tiebreak (same value for (i,j) and (j,i)).
    # Matching needs mutual-strongest agreement; on constant-coefficient
    # stencils every weight ties, and an asymmetric tiebreak (e.g. raw
    # column index) makes i pick j while j picks someone else — only a
    # handful of pairs matched per round, and the leftover phase then
    # cascaded whole regions into single aggregates (observed: 79k-row
    # aggregates at n=262k).  A hashed symmetric tiebreak is Luby-style
    # matching: a constant fraction of vertices pairs every round.
    ekey = np.minimum(e_rows, e_cols) * n + np.maximum(e_rows, e_cols)
    if deterministic:
        e_tb = (ekey.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFF)
    else:
        rng_tb = np.random.default_rng(seed)
        h = rng_tb.permutation(1 << 20)
        e_tb = h[ekey % (1 << 20)]

    # one-time sort establishing _strongest's per-row best-first invariant
    order = np.lexsort((e_tb, -e_vals, e_rows))
    e_rows, e_cols = e_rows[order], e_cols[order]

    agg = np.full(n, -1, np.int64)
    next_id = 0
    # live edges = both endpoints still unassigned; compacted every round
    # so each scan only pays for the shrinking frontier
    lr, lc = e_rows, e_cols
    ones = np.ones(n, bool)
    for _ in range(max_iterations):
        free = agg < 0
        if free.sum() <= max_unassigned_ratio * n:
            break
        # strongest unassigned neighbor of each unassigned vertex, then
        # match mutual-strongest pairs (pgm.cpp find_strongest_neighbor /
        # match_edge) — ids assigned in ascending-i order like the
        # reference's sequential sweep
        strongest = _strongest(lr, lc, ones, ones)
        i_arr = np.nonzero(strongest >= 0)[0]
        j_arr = strongest[i_arr]
        mutual = (strongest[j_arr] == i_arr) & (i_arr < j_arr)
        pi, pj = i_arr[mutual], j_arr[mutual]
        if pi.size == 0:
            break
        ids = next_id + np.arange(pi.size)
        agg[pi] = ids
        agg[pj] = ids
        next_id += pi.size
        live = (agg[lr] < 0) & (agg[lc] < 0)
        lr, lc = lr[live], lc[live]
    # assign leftovers to their strongest aggregated neighbor; iterate so
    # chains resolve, but only into aggregates still below the size cap —
    # unbounded cascading glued whole mesh regions together
    max_agg_size = 8
    while True:
        free = agg < 0
        if not free.any():
            break
        sizes = np.bincount(agg[~free], minlength=max(next_id, 1))
        ok_target = ~free
        ok_target[~free] &= sizes[agg[~free]] < max_agg_size
        strongest = _strongest(e_rows, e_cols, free, ok_target)
        attach = np.nonzero(strongest >= 0)[0]
        if attach.size == 0:
            break
        agg[attach] = agg[strongest[attach]]
        # edges from still-free rows only
        keep = agg[e_rows] < 0
        e_rows, e_cols = e_rows[keep], e_cols[keep]
    rest = np.nonzero(agg < 0)[0]
    agg[rest] = next_id + np.arange(rest.size)
    return _renumber(agg, n)


def galerkin_coarse(data: MatrixData, agg: np.ndarray,
                    num_coarse: int) -> MatrixData:
    """Coarse operator RᵀAP by index mapping + sum-duplicates."""
    d = data.canonical()
    return MatrixData((num_coarse, num_coarse), agg[d.row_idx],
                      agg[d.col_idx], d.values).canonical()


class Pgm:
    """Factory: ``Pgm(max_iterations=15).generate(A)`` -> MultigridLevel."""

    def __init__(self, max_iterations: int = 15,
                 max_unassigned_ratio: float = 0.05,
                 deterministic: bool = True, algorithm: str = "auto"):
        self.max_iterations = max_iterations
        self.max_unassigned_ratio = max_unassigned_ratio
        self.deterministic = deterministic
        self.algorithm = algorithm

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> MultigridLevel:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        agg = pgm_aggregate(data, self.max_iterations,
                            self.max_unassigned_ratio, self.deterministic,
                            algorithm=self.algorithm)
        nc = int(agg.max()) + 1 if agg.size else 1
        coarse = _coarse_csr(galerkin_coarse(data, agg, nc))
        agg_j = jnp.asarray(agg, jnp.int32)
        P_op, R_op = _agg_transfer_ops(agg, nc)
        return MultigridLevel(
            fine_op=A if isinstance(A, LinOp) else Csr.from_data(data),
            prolong=AggProlong(agg=agg_j, num_coarse=nc, op=P_op),
            restrict=AggRestrict(agg=agg_j, num_coarse=nc, op=R_op),
            coarse_op=coarse)


class FixedCoarsening:
    """User-supplied coarse row subset (``fixed_coarsening.hpp``): coarse
    space = selected rows; P = selection-scatter, R = selection-gather."""

    def __init__(self, coarse_rows):
        self.coarse_rows = np.asarray(coarse_rows, np.int64)

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> MultigridLevel:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        n = data.shape[0]
        sel = self.coarse_rows
        nc = sel.shape[0]
        # agg-style map: selected rows -> own id; others -> nearest selected
        # (simple injection: non-selected rows map to dropped segment)
        agg = np.full(n, nc, np.int64)
        agg[sel] = np.arange(nc)
        d = data.canonical()
        keep = (agg[d.row_idx] < nc) & (agg[d.col_idx] < nc)
        coarse_data = MatrixData((nc, nc), agg[d.row_idx[keep]],
                                 agg[d.col_idx[keep]],
                                 d.values[keep]).canonical()
        return MultigridLevel(
            fine_op=A if isinstance(A, LinOp) else Csr.from_data(data),
            prolong=_SelProlong(sel=jnp.asarray(sel, jnp.int32), n_fine=n),
            restrict=_SelRestrict(sel=jnp.asarray(sel, jnp.int32), n_fine=n),
            coarse_op=_coarse_csr(coarse_data))


@linop_dataclass
class _SelProlong(LinOp):
    sel: jnp.ndarray
    n_fine: int = static_field()

    @property
    def shape(self):
        return (self.n_fine, self.sel.shape[0])

    def _apply(self, b):
        return jnp.zeros((self.n_fine, b.shape[1]), b.dtype).at[
            self.sel].set(b)


@linop_dataclass
class _SelRestrict(LinOp):
    sel: jnp.ndarray
    n_fine: int = static_field()

    @property
    def shape(self):
        return (self.sel.shape[0], self.n_fine)

    def _apply(self, b):
        return b[self.sel]
