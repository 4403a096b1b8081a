"""CSR format — the workhorse.

Analog of ``include/ginkgo/core/matrix/csr.hpp:104`` / ``core/matrix/csr.cpp``.
Ginkgo's SpMV strategy objects (``csr.hpp:176-212``: classical / load_balance /
merge_path / sparselib / automatical) become *build-time layout choices*: the
constructor precomputes whatever auxiliary arrays the chosen kernel needs
(Ginkgo's ``strategy_type::process`` analog), and the kernel registry picks
the jnp reference or Pallas TPU implementation.

Strategies here:
  - ``classical``: gather + segment-sum over an explicit row-index expansion
    (reference oracle; also the fallback TPU path).
  - ``banded``: diagonal-offset (DIA) layout auto-detected for stencil-like
    matrices — SpMV becomes a sum of shifted dense axpys with zero gather
    (see ops/spmv_pallas.py).
  - ``packed``: packed-slot windowed-ELL for general unstructured matrices
    with column locality (RCM'd SuiteSparse profiles) — the on-chip
    VMEM-window gather answer to Ginkgo's load-balanced/merge-path CSR
    (see ops/spmv_packed.py); off-layout entries spill to a COO tail.
  - ``automatical``: ``banded`` when the band census fits, else ``packed``
    when its padding stays economical, else ``classical`` (Ginkgo's
    automatical analog, ``csr.hpp:522-650``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from ..ops.registry import lookup
from .coo import pad_nnz


def fast_spmv_apply(op, b):
    """Banded/packed + COO-tail SpMV dispatch over the aux attributes
    shared by ``Csr`` and ``fastpath.SpmvPlan``.  Returns None when the
    operator carries no fast-path layout (caller falls back)."""
    if op.strategy == "banded" and op.diag_values is not None:
        y = lookup("dia_spmv")(op.diag_offsets, op.diag_values,
                               dict(op.band_meta), b)
    elif op.strategy == "packed" and op.pell_vals is not None:
        y = lookup("pell_spmv")(op.pell_vals, op.pell_idx,
                                op.pell_qw, op.pell_xbase,
                                op.pell_meta, b)
    else:
        return None
    if op.tail_rows is not None:
        y = y + lookup("coo_spmv")(op.tail_rows, op.tail_cols,
                                   op.tail_vals, b, op.shape[0])
    return y


def aux_device_kw(n, value_dtype, index_dtype, tail, pell):
    """Pad + device-place the COO tail and packed layout produced by
    ``_process_strategy`` (shared by Csr and fastpath.SpmvPlan builds)."""
    kw = {}
    if tail is not None:
        tr, tc, tv = tail
        tcap = pad_nnz(len(tr), 8)
        tro = np.full(tcap, n, np.int64)
        tco = np.zeros(tcap, np.int64)
        tvo = np.zeros(tcap, value_dtype)
        tro[:len(tr)] = tr
        tco[:len(tr)] = tc
        tvo[:len(tr)] = tv
        kw.update(tail_rows=jnp.asarray(tro, index_dtype),
                  tail_cols=jnp.asarray(tco, index_dtype),
                  tail_vals=jnp.asarray(tvo))
    if pell is not None:
        kw.update(pell_meta=pell["meta"],
                  pell_vals=jnp.asarray(pell["vals"]),
                  pell_idx=jnp.asarray(pell["idx"]),
                  pell_qw=jnp.asarray(pell["qw"]),
                  pell_xbase=jnp.asarray(pell["xbase_row"]))
    return kw


@linop_dataclass
class Csr(LinOp):
    row_ptr: jnp.ndarray   # (n+1,) int
    col_idx: jnp.ndarray   # (nnz_stored,) int
    values: jnp.ndarray    # (nnz_stored,)
    row_idx: jnp.ndarray   # (nnz_stored,) int — expanded rows (strategy aux)
    shape: tuple = static_field()
    nnz: int = static_field()
    strategy: str = static_field(default="classical")
    # banded-strategy aux (strategy_type::process analog): static diagonal
    # offsets + layout plan, plus the (G, D, S, 128) blocked diagonal values
    diag_offsets: object = static_field(default=None)  # tuple of ints
    band_meta: object = static_field(default=None)     # frozen layout dict
    diag_values: jnp.ndarray | None = None             # (G, D, S, 128)
    # banded+tail: off-band outliers kept as a small COO correction so
    # almost-banded matrices (boundary conditions, RCM'd profiles) still
    # take the Pallas fast path
    tail_rows: jnp.ndarray | None = None
    tail_cols: jnp.ndarray | None = None
    tail_vals: jnp.ndarray | None = None
    # packed-slot windowed-ELL aux (general unstructured fast path;
    # ops/spmv_packed.py) — the load-balanced CSR SpMV analog
    pell_meta: object = static_field(default=None)
    pell_vals: jnp.ndarray | None = None   # (Gs, 8*Wv, 8, 128)
    pell_idx: jnp.ndarray | None = None    # int16, same shape
    pell_qw: jnp.ndarray | None = None     # (Gs*8*Wv,) int32
    pell_xbase: jnp.ndarray | None = None  # (Gs,) int32

    # -- SpMV ------------------------------------------------------------------
    def _apply(self, b):
        y = fast_spmv_apply(self, b)
        if y is not None:
            return y
        return lookup("coo_spmv")(self.row_idx, self.col_idx, self.values,
                                  b, self.shape[0])

    # -- construction ------------------------------------------------------------
    @classmethod
    def from_data(cls, data: MatrixData, dtype=None, index_dtype=jnp.int32,
                  strategy: str = "automatical", pad_multiple: int = 8):
        return cls._from_canonical_data(data.canonical(), dtype=dtype,
                                        index_dtype=index_dtype,
                                        strategy=strategy,
                                        pad_multiple=pad_multiple)

    @classmethod
    def _from_canonical_data(cls, d: MatrixData, dtype=None,
                             index_dtype=jnp.int32,
                             strategy: str = "automatical",
                             pad_multiple: int = 8):
        """Build from already row-major-sorted, deduplicated data WITHOUT
        re-canonicalizing — preserves explicit zeros (pattern-preserving
        callers like add_scaled_identity need the structural pattern kept
        even where the new value is exactly zero)."""
        n, m = d.shape
        nnz = d.nnz
        values_np = d.values if dtype is None else d.values.astype(dtype)

        (strategy, diag_offsets, band_meta, diag_values,
         tail, pell) = _process_strategy(strategy, d, values_np)

        cap = pad_nnz(nnz, pad_multiple)
        rows = np.full(cap, n, np.int64)
        cols = np.zeros(cap, np.int64)
        vals = np.zeros(cap, values_np.dtype)
        rows[:nnz] = d.row_idx
        cols[:nnz] = d.col_idx
        vals[:nnz] = values_np
        row_ptr = d.row_ptrs()
        aux_kw = aux_device_kw(n, values_np.dtype, index_dtype, tail, pell)
        return cls(row_ptr=jnp.asarray(row_ptr, index_dtype),
                   col_idx=jnp.asarray(cols, index_dtype),
                   values=jnp.asarray(vals),
                   row_idx=jnp.asarray(rows, index_dtype),
                   shape=(n, m), nnz=nnz, strategy=strategy,
                   diag_offsets=diag_offsets, band_meta=band_meta,
                   diag_values=None if diag_values is None
                   else jnp.asarray(diag_values), **aux_kw)

    @classmethod
    def from_dense(cls, dense, **kwargs):
        return cls.from_data(MatrixData.from_dense(np.asarray(dense)), **kwargs)

    # -- conversions ---------------------------------------------------------------
    def to_dense(self):
        return jnp.zeros(self.shape, self.values.dtype).at[
            self.row_idx, self.col_idx].add(self.values, mode="drop")

    def to_coo(self):
        from .coo import Coo
        return Coo(row_idx=self.row_idx, col_idx=self.col_idx,
                   values=self.values, shape=self.shape, nnz=self.nnz)

    def to_matrix_data(self) -> MatrixData:
        return MatrixData(self.shape,
                          np.asarray(self.row_idx)[:self.nnz],
                          np.asarray(self.col_idx)[:self.nnz],
                          np.asarray(self.values)[:self.nnz])

    def to_ell(self, **kw):
        from .ell import Ell
        return Ell.from_data(self.to_matrix_data(), **kw)

    def to_sellp(self, **kw):
        from .sellp import Sellp
        return Sellp.from_data(self.to_matrix_data(), **kw)

    def to_hybrid(self, **kw):
        from .hybrid import Hybrid
        return Hybrid.from_data(self.to_matrix_data(), **kw)

    def to_fbcsr(self, **kw):
        from .fbcsr import Fbcsr
        return Fbcsr.from_data(self.to_matrix_data(), **kw)

    def to_sparsity_csr(self, **kw):
        from .sparsity_csr import SparsityCsr
        return SparsityCsr.from_data(self.to_matrix_data(), **kw)

    def _banded_transposed(self, conj: bool):
        """Banded stays banded THROUGH jit: negate the (static) offsets
        and shift each diagonal's value row by its offset — static
        slices only, so the Pallas fast path survives transposition
        inside a trace (previously a silent ~500x classical cliff)."""
        from ..ops.spmv_pallas import plan_banded_layout, \
            unblock_diag_values
        meta = dict(self.band_meta)
        n = meta["n"]
        dv = unblock_diag_values(self.diag_values, meta)
        if conj:
            dv = jnp.conj(dv)
        offsets = self.diag_offsets
        pairs = sorted((-int(k), d) for d, k in enumerate(offsets))
        new_offsets = tuple(k for k, _ in pairs)
        rows = []
        for _, d in pairs:
            k = int(offsets[d])
            row = dv[d]
            # A[i, i+k] = dv[d, i]  =>  Aᵀ[i, i-k] = dv[d, i-k]
            if k > 0:
                row = jnp.concatenate(
                    [jnp.zeros((k,), row.dtype), row[:-k]])
            elif k < 0:
                row = jnp.concatenate(
                    [row[-k:], jnp.zeros((-k,), row.dtype)])
            rows.append(row)
        dvt = jnp.stack(rows)
        meta2 = plan_banded_layout(new_offsets, n)
        NSp, S, G = meta2["NSp"], meta2["S"], meta2["G"]
        D = dvt.shape[0]
        dvp = jnp.pad(dvt, ((0, 0), (0, NSp * 128 - n)))
        dvb2 = jnp.transpose(dvp.reshape(D, G, S, 128), (1, 0, 2, 3))
        # classical arrays via the COO re-sort (dead-code-eliminated by
        # XLA when only the banded path is consumed)
        coo_t = (self.to_coo().conj_transpose() if conj
                 else self.to_coo().transpose())
        base = coo_t.to_csr()
        tail_kw = {}
        if self.tail_rows is not None:
            tv = jnp.conj(self.tail_vals) if conj else self.tail_vals
            tail_kw = dict(tail_rows=self.tail_cols,
                           tail_cols=self.tail_rows, tail_vals=tv)
        return dataclass_replace(
            base, strategy="banded", diag_offsets=new_offsets,
            band_meta=tuple(sorted(meta2.items())), diag_values=dvb2,
            **tail_kw)

    def transpose(self):
        """Transpose; a banded matrix stays banded, in and out of jit."""
        if self.strategy == "banded" and self.diag_values is not None:
            return self._banded_transposed(conj=False)
        return self.to_coo().transpose().to_csr()

    def conj_transpose(self):
        if self.strategy == "banded" and self.diag_values is not None:
            return self._banded_transposed(conj=True)
        return self.to_coo().conj_transpose().to_csr()

    def extract_diagonal(self):
        return self.to_coo().extract_diagonal()

    def _map_values(self, fn):
        """Apply an elementwise map to every value-carrying aux array
        (classical + banded + packed + tails stay consistent)."""
        new = dataclass_replace(self, values=fn(self.values))
        for field in ("diag_values", "tail_vals", "pell_vals"):
            v = getattr(self, field)
            if v is not None:
                new = dataclass_replace(new, **{field: fn(v)})
        return new

    def scale(self, alpha):
        return self._map_values(lambda v: v * alpha)

    def inv_scale(self, alpha):
        """values / alpha (``csr.hpp:1356`` inv_scale)."""
        return self._map_values(lambda v: v / alpha)

    def compute_absolute(self):
        """|A| entrywise (AbsoluteComputable, ``csr.hpp:1192``)."""
        return self._map_values(jnp.abs)

    def add_scaled_identity(self, alpha, beta):
        """``beta*A + alpha*I`` on the existing pattern (ScaledIdentityAddable,
        ``core/matrix/csr.cpp:1576-1589``).  Like the reference, requires every
        diagonal entry to be structurally present (raises ValueError
        otherwise), and the structural pattern is preserved even where the new
        value is exactly zero.  The check runs on host, so this is a
        build-time API when the matrix uses the banded strategy."""
        import jax.core

        def _tracer(x):
            return isinstance(x, jax.core.Tracer)

        concrete = not _tracer(self.values)
        if concrete:
            rows = np.asarray(self.row_idx)[:self.nnz]
            cols = np.asarray(self.col_idx)[:self.nnz]
            if np.count_nonzero(rows == cols) < min(self.shape):
                from ..base.exceptions import UnsupportedMatrixProperty
                raise UnsupportedMatrixProperty(
                    "add_scaled_identity: matrix has structurally zero "
                    "diagonal entries")
        if self.strategy in ("banded", "packed"):
            if not concrete or _tracer(alpha) or _tracer(beta):
                raise ValueError(
                    f"add_scaled_identity on a {self.strategy}-strategy "
                    "Csr is a build-time (non-traced) operation; rebuild "
                    "with strategy='classical' to shift inside jit")
            vals = np.asarray(self.values)[:self.nnz]
            new_vals = beta * vals + np.where(
                rows == cols, alpha, 0).astype(vals.dtype)
            # pattern-preserving rebuild (entries are already canonical
            # row-major order; _from_canonical_data keeps exact zeros)
            return Csr._from_canonical_data(
                MatrixData(self.shape, rows, cols, new_vals),
                strategy="automatical", dtype=self.values.dtype)
        on_diag = self.row_idx == self.col_idx
        vals = beta * self.values + jnp.where(on_diag, alpha, 0).astype(
            self.values.dtype)
        return dataclass_replace(self, values=vals)

    # -- sparse algebra (host symbolic + device numeric; ops/spgemm.py) ------
    def spgemm(self, other, **kwargs):
        """C = self @ other (``csr.cpp`` spgemm). One-shot; for repeated
        products on fixed patterns use ops.spgemm.SpgemmReuse."""
        from ..ops.spgemm import spgemm_data
        return Csr.from_data(
            spgemm_data(self.to_matrix_data(), other.to_matrix_data()),
            **kwargs)

    def spgeam(self, alpha, beta, other, **kwargs):
        """C = alpha*self + beta*other (pattern union)."""
        from ..ops.spgemm import spgeam_data
        return Csr.from_data(
            spgeam_data(alpha, self.to_matrix_data(), beta,
                        other.to_matrix_data()), **kwargs)

    def permute(self, perm, mode=None, **kwargs):
        """Symmetric (or mode-selected) permutation (csr.hpp Permutable)."""
        from .permutation import permute_data, permute_mode
        if mode is None:
            mode = permute_mode.symmetric
        return Csr.from_data(permute_data(self.to_matrix_data(),
                                          np.asarray(perm), mode), **kwargs)

    def scale_permute(self, row_sp, mode=None, col_sp=None,
                      invert: bool = False, **kwargs):
        """Scaled permutation (``csr.hpp`` scale_permute): one
        ScaledPermutation + permute_mode, or row/col pair with ``invert``.
        Host-side (build-time), like permute."""
        from .permutation import scale_permute_data
        return Csr.from_data(
            scale_permute_data(self.to_matrix_data(), row_sp, mode=mode,
                               col_sp=col_sp, invert=invert), **kwargs)

    def create_submatrix(self, rows: slice, cols: slice, **kwargs):
        """Extract the [rows, cols] block (csr.cpp submatrix kernels)."""
        d = self.to_matrix_data()
        r0 = rows.start or 0
        r1 = self.shape[0] if rows.stop is None else rows.stop
        c0 = cols.start or 0
        c1 = self.shape[1] if cols.stop is None else cols.stop
        keep = ((d.row_idx >= r0) & (d.row_idx < r1)
                & (d.col_idx >= c0) & (d.col_idx < c1))
        sub = MatrixData((r1 - r0, c1 - c0), d.row_idx[keep] - r0,
                         d.col_idx[keep] - c0, d.values[keep])
        return Csr.from_data(sub, **kwargs)

    def is_sorted_by_column_index(self) -> bool:
        """Host-side check that every row's columns are ascending
        (``csr.hpp:1207``).  Always true for matrices built through
        MatrixData.canonical(); useful for externally assembled arrays."""
        rows = np.asarray(self.row_idx)[:self.nnz]
        cols = np.asarray(self.col_idx)[:self.nnz]
        order = np.lexsort((cols, rows))
        return bool(np.array_equal(order, np.arange(self.nnz))
                    and np.array_equal(rows, np.sort(rows)))

    def sort_by_column_index(self):
        """Return a copy with each row's entries sorted by column index
        (``csr.hpp:1199``; build-time, host side).  A pure reorder like the
        reference: explicit zeros and duplicate coordinates are preserved,
        not canonicalized away."""
        if self.is_sorted_by_column_index():
            return self
        rows = np.asarray(self.row_idx)
        cols = np.asarray(self.col_idx)
        vals = np.asarray(self.values)
        # padded slots carry row == n, so lexsort keeps them at the end
        order = np.lexsort((cols, rows))
        return dataclass_replace(
            self, row_idx=jnp.asarray(rows[order], self.row_idx.dtype),
            col_idx=jnp.asarray(cols[order], self.col_idx.dtype),
            values=jnp.asarray(vals[order]))

    # row lengths (for strategy decisions / ELL conversion)
    def row_lengths(self):
        return self.row_ptr[1:] - self.row_ptr[:-1]

    def astype(self, dtype):
        return self._map_values(lambda v: v.astype(dtype))


def dataclass_replace(obj, **changes):
    import dataclasses
    return dataclasses.replace(obj, **changes)


# ---------------------------------------------------------------------------
# Strategy processing (build-time, host side) — strategy_type::process analog
# ---------------------------------------------------------------------------

_BANDED_MAX_DIAGS = 64        # cap aux storage at 64 diagonals
_BANDED_MIN_FILL = 0.55       # required nnz density along kept diagonals


# tail acceptance: outlier gathers cost ~7ns/element on TPU vs ~5ps/value
# for the streamed diagonals — keep the tail under ~0.05% of the band work
_TAIL_FRACTION = 5e-4


def _process_strategy(strategy: str, d: MatrixData, values_np: np.ndarray):
    """Decide the kernel layout and precompute its aux arrays.

    Returns (strategy, offsets, meta, blocked_diag_values, tail) where tail
    is None or (rows, cols, vals) of off-band outliers."""
    if strategy not in ("classical", "banded", "automatical", "packed",
                        "load_balance", "merge_path", "sparselib"):
        raise ValueError(f"unknown CSR strategy {strategy!r}")
    # merge_path/load_balance/sparselib are GPU-ism aliases: on TPU they all
    # resolve to the load-balanced segment-sum path (classical).
    if strategy in ("load_balance", "merge_path", "sparselib", "classical"):
        return "classical", None, None, None, None, None
    if strategy == "packed":
        # explicit request: skip the automatical pad-ratio economy check —
        # even an 8x-padded stream beats the 7 ns/element gather tier by
        # ~100x (e.g. single-entry-per-row transfer operators); only the
        # tail cap (layout correctness economics) still applies
        pell = _process_packed(d, values_np, max_pad=float("inf"))
        if pell is not None:
            return ("packed", None, None, None, pell[1], pell[0])
        return "classical", None, None, None, None, None

    n, m = d.shape
    if n != m or d.nnz == 0:
        return "classical", None, None, None, None, None
    diag_of = d.col_idx.astype(np.int64) - d.row_idx
    offsets, counts = np.unique(diag_of, return_counts=True)

    tail_mask = None
    if strategy == "automatical":
        # keep reasonably dense diagonals (boundary-clipped stencil
        # diagonals included); spill sparse outliers to the COO tail
        dense_enough = counts >= 0.3 * n
        chosen = offsets[dense_enough]
        if chosen.size > _BANDED_MAX_DIAGS:
            order = np.argsort(-counts[dense_enough])[:_BANDED_MAX_DIAGS]
            chosen = np.sort(chosen[order])
        if chosen.size == 0:
            return _fallback_general(d, values_np)
        kept_nnz = counts[np.isin(offsets, chosen)].sum()
        # banded only pays when the kept diagonals are collectively dense
        if kept_nnz / (chosen.size * n) < _BANDED_MIN_FILL:
            return _fallback_general(d, values_np)
        tail_nnz = d.nnz - kept_nnz
        if tail_nnz > max(64, _TAIL_FRACTION * chosen.size * n):
            return _fallback_general(d, values_np)
        if tail_nnz:
            tail_mask = ~np.isin(diag_of, chosen)
        offsets = chosen
    if offsets.size > 4096:
        return _fallback_general(d, values_np)

    # Build (num_diags, n) diagonal value array indexed by row, then block it
    # into the pipeline layout the Pallas kernel consumes.
    from ..ops.spmv_pallas import block_diag_values, plan_banded_layout
    keep = (~tail_mask) if tail_mask is not None else slice(None)
    diag_values = np.zeros((offsets.size, n), values_np.dtype)
    diag_idx = np.searchsorted(offsets, diag_of[keep])
    diag_values[diag_idx, d.row_idx[keep]] = values_np[keep]
    offsets_t = tuple(int(o) for o in offsets)
    meta = plan_banded_layout(offsets_t, n)
    dvb = block_diag_values(diag_values, meta)
    tail = None
    if tail_mask is not None:
        tail = (d.row_idx[tail_mask], d.col_idx[tail_mask],
                values_np[tail_mask])
    return ("banded", offsets_t, tuple(sorted(meta.items())), dvb, tail,
            None)


# packed-layout acceptance: the DMA streams pad_ratio x the useful
# bytes, so beyond ~6x padding the classical gather path wins back
_PACKED_MAX_PAD = 6.0
_PACKED_MAX_TAIL = 0.05


def _process_packed(d: MatrixData, values_np: np.ndarray,
                    max_pad: float = _PACKED_MAX_PAD):
    """(layout, tail) for the packed-slot windowed-ELL general-matrix
    path, or None when the matrix does not fit its static bounds."""
    from ..ops.spmv_packed import plan_packed_layout
    mp = None if max_pad == float("inf") else max_pad
    layout, tail, stats = plan_packed_layout(d, values_np, max_pad=mp,
                                             max_tail=_PACKED_MAX_TAIL)
    if layout is None:
        return None
    if (stats["pad_ratio"] > max_pad
            or stats["tail_nnz"] > _PACKED_MAX_TAIL * max(d.nnz, 1)):
        return None
    if tail is not None and len(tail[0]) == 0:
        tail = None
    return layout, tail


def _fallback_general(d: MatrixData, values_np: np.ndarray):
    """automatical, non-banded case: packed-slot layout when it fits,
    classical otherwise (csr.hpp automatical analog)."""
    pell = _process_packed(d, values_np)
    if pell is not None:
        return "packed", None, None, None, pell[1], pell[0]
    if d.nnz >= 1 << 16:
        # large matrix on the gather path: tell the user the framework's
        # prescription (performance_hint.hpp analog)
        from ..log.logger import PERFORMANCE_FALLBACK, dispatch
        dispatch(PERFORMANCE_FALLBACK, kernel="csr_spmv",
                 reason="no column locality for the banded/packed layouts"
                        " — classical gather SpMV is ~7 ns/element on TPU;"
                        " apply Rcm/NestedDissection reordering first")
    return "classical", None, None, None, None, None
