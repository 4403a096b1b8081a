"""Batch module — thousands of small independent systems.

Analog of Ginkgo's batch type hierarchy (SURVEY.md §2.10):
``batch::MultiVector`` (``batch_multi_vector.hpp:52``), ``batch::matrix::
{Csr,Dense,Ell,Identity}``, ``batch::solver::{Bicgstab,Cg}`` with
whole-solve-in-one-kernel semantics (``batch_dispatch.hpp:241``) and
per-system stopping (``batch_stop_enum.hpp``).

TPU-native mapping: one batch entry = one vmap lane.  The formats share one
sparsity pattern across the batch (as Ginkgo's batch::matrix::Csr does) with
per-entry values, and a batch solve is ``vmap`` of the corresponding jitted
Krylov loop — XLA fuses the whole iteration across the batch, which is
exactly the "one small system per thread-block" GPU design re-expressed for
a vector machine.  Per-system early exit becomes per-lane masking inside the
shared while_loop (same cost model as the GPU kernel: the batch runs until
its slowest system converges).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .base.linop import LinOp, linop_dataclass, static_field
from .base.matrix_data import MatrixData
from .matrix.coo import pad_nnz
from .matrix.csr import Csr
from .matrix.dense import Dense
from .matrix.ell import Ell
from .stop.criterion import Combined, Iteration, ResidualNorm


def _batch_scalar(alpha, num_batch):
    """Normalize a scalar / (nb,) array / BatchMultiVector of shape
    (nb, 1, 1) to a (nb,) array (the per-entry scalars Ginkgo's batch
    add_scaled_identity takes as MultiVectors)."""
    if isinstance(alpha, BatchMultiVector):
        alpha = alpha.data
    alpha = jnp.asarray(alpha)
    return jnp.broadcast_to(alpha.reshape(-1) if alpha.ndim else alpha,
                            (num_batch,))


# ---------------------------------------------------------------------------
# Batch formats (shared pattern, per-entry values)
# ---------------------------------------------------------------------------

@linop_dataclass
class BatchCsr:
    """batch::matrix::Csr — one sparsity, (num_batch, nnz_stored) values."""

    row_idx: jnp.ndarray     # (nnz_stored,)
    col_idx: jnp.ndarray     # (nnz_stored,)
    row_ptr: jnp.ndarray     # (n + 1,) pattern-static
    values: jnp.ndarray      # (num_batch, nnz_stored)
    shape: tuple = static_field()       # (n, m) per entry
    nnz: int = static_field()

    @property
    def num_batch_items(self):
        return self.values.shape[0]

    def item(self, values_row) -> Csr:
        """The per-lane view used inside vmap (pattern-consistent row_ptr
        so row_lengths & friends are correct on batch items)."""
        return Csr(row_ptr=self.row_ptr, col_idx=self.col_idx,
                   values=values_row, row_idx=self.row_idx,
                   shape=self.shape, nnz=self.nnz, strategy="classical")

    def apply(self, b):
        """b: (num_batch, n, k) -> (num_batch, n, k)."""
        return jax.vmap(lambda v, bb: self.item(v)._apply(bb))(
            self.values, b)

    @classmethod
    def from_data(cls, items, dtype=None, index_dtype=jnp.int32,
                  pad_multiple: int = 8):
        """items: list of MatrixData sharing one pattern (values may differ),
        or (pattern MatrixData, values (nb, nnz))."""
        if isinstance(items, tuple) and len(items) == 2:
            pattern, values = items
            d = pattern.canonical()
            values = np.asarray(values)
        else:
            ds = [it.canonical() for it in items]
            d = ds[0]
            for o in ds[1:]:
                if (o.shape != d.shape or o.nnz != d.nnz
                        or not np.array_equal(o.row_idx, d.row_idx)
                        or not np.array_equal(o.col_idx, d.col_idx)):
                    raise ValueError(
                        "batch entries must share one sparsity pattern")
            values = np.stack([o.values for o in ds])
        if dtype is not None:
            values = values.astype(dtype)
        nb, nnz = values.shape
        cap = pad_nnz(nnz, pad_multiple)
        rows = np.full(cap, d.shape[0], np.int64)
        cols = np.zeros(cap, np.int64)
        vals = np.zeros((nb, cap), values.dtype)
        rows[:nnz] = d.row_idx
        cols[:nnz] = d.col_idx
        vals[:, :nnz] = values
        return cls(row_idx=jnp.asarray(rows, index_dtype),
                   col_idx=jnp.asarray(cols, index_dtype),
                   row_ptr=jnp.asarray(d.row_ptrs(), index_dtype),
                   values=jnp.asarray(vals), shape=d.shape, nnz=nnz)

    def to_dense_batch(self):
        return jax.vmap(lambda v: self.item(v).to_dense())(self.values)

    def extract_diagonals(self):
        """(num_batch, n) diagonal values — batch Jacobi input."""
        on = self.row_idx == self.col_idx
        idx = jnp.where(on, self.row_idx, self.shape[0])
        return jax.vmap(lambda v: jnp.zeros(
            (self.shape[0],), v.dtype).at[idx].add(
            jnp.where(on, v, 0), mode="drop"))(self.values)

    def add_scaled_identity(self, alpha, beta):
        """Per-entry ``beta_i*A_i + alpha_i*I`` (``batch_csr.hpp:380``).
        alpha/beta: scalars or (num_batch,) arrays.  Requires every diagonal
        entry structurally present, like the reference."""
        import jax.core
        if not isinstance(self.row_idx, jax.core.Tracer):
            rows = np.asarray(self.row_idx)[:self.nnz]
            cols = np.asarray(self.col_idx)[:self.nnz]
            if np.count_nonzero(rows == cols) < min(self.shape):
                from .base.exceptions import UnsupportedMatrixProperty
                raise UnsupportedMatrixProperty(
                    "add_scaled_identity: matrix has structurally zero "
                    "diagonal entries")
        a = _batch_scalar(alpha, self.num_batch_items)[:, None]
        b = _batch_scalar(beta, self.num_batch_items)[:, None]
        on = (self.row_idx == self.col_idx).astype(self.values.dtype)
        return dataclasses.replace(self, values=b * self.values + a * on)


@linop_dataclass
class BatchDense:
    """batch::matrix::Dense — (num_batch, n, m)."""

    data: jnp.ndarray

    @property
    def shape(self):
        return self.data.shape[1:]

    @property
    def num_batch_items(self):
        return self.data.shape[0]

    def item(self, data):
        return Dense(data=data)

    @property
    def values(self):
        return self.data

    def apply(self, b):
        return jnp.einsum("bnm,bmk->bnk", self.data, b.astype(self.data.dtype))

    def extract_diagonals(self):
        return jnp.diagonal(self.data, axis1=1, axis2=2)

    def add_scaled_identity(self, alpha, beta):
        """Per-entry ``beta_i*A_i + alpha_i*I`` (``batch_dense.hpp:384``)."""
        a = _batch_scalar(alpha, self.num_batch_items)[:, None, None]
        b = _batch_scalar(beta, self.num_batch_items)[:, None, None]
        eye = jnp.eye(*self.shape, dtype=self.data.dtype)
        return BatchDense(data=b * self.data + a * eye)


@linop_dataclass
class BatchEll:
    """batch::matrix::Ell — shared (n, w) cols, (num_batch, n, w) values."""

    col_idx: jnp.ndarray
    values: jnp.ndarray
    row_lengths: jnp.ndarray
    shape: tuple = static_field()
    nnz: int = static_field()

    @property
    def num_batch_items(self):
        return self.values.shape[0]

    def item(self, v) -> Ell:
        return Ell(col_idx=self.col_idx, values=v,
                   row_lengths=self.row_lengths, shape=self.shape,
                   nnz=self.nnz)

    def apply(self, b):
        return jax.vmap(lambda v, bb: self.item(v)._apply(bb))(
            self.values, b)

    def extract_diagonals(self):
        on = self.col_idx == jnp.arange(self.shape[0])[:, None]
        return jax.vmap(lambda v: jnp.sum(jnp.where(on, v, 0), axis=1))(
            self.values)

    def add_scaled_identity(self, alpha, beta):
        """Per-entry ``beta_i*A_i + alpha_i*I`` (``batch_ell.hpp:392``).
        Requires every diagonal entry structurally present (each row must
        reference its own column with a stored slot)."""
        import jax.core
        on = self.col_idx == jnp.arange(self.shape[0])[:, None]
        # padded slots carry col_idx == 0 (ell.py layout), so row 0's pads
        # would false-match its diagonal; only slots inside row_lengths are
        # structural entries
        valid = (jnp.arange(self.col_idx.shape[1])[None, :]
                 < self.row_lengths[:, None])
        on = on & valid
        if not isinstance(self.col_idx, jax.core.Tracer):
            if int(jnp.count_nonzero(jnp.any(on, axis=1))) < min(self.shape):
                from .base.exceptions import UnsupportedMatrixProperty
                raise UnsupportedMatrixProperty(
                    "add_scaled_identity: matrix has structurally zero "
                    "diagonal entries")
        a = _batch_scalar(alpha, self.num_batch_items)[:, None, None]
        b = _batch_scalar(beta, self.num_batch_items)[:, None, None]
        add = on.astype(self.values.dtype)[None, :, :]
        return dataclasses.replace(self, values=b * self.values + a * add)

    @classmethod
    def from_data(cls, items, dtype=None, index_dtype=jnp.int32):
        ds = [it.canonical() for it in items]
        d0 = ds[0]
        for o in ds[1:]:
            if (o.shape != d0.shape or o.nnz != d0.nnz
                    or not np.array_equal(o.row_idx, d0.row_idx)
                    or not np.array_equal(o.col_idx, d0.col_idx)):
                raise ValueError(
                    "batch entries must share one sparsity pattern")
        ells = [Ell.from_data(it, dtype, index_dtype, fast=False)
                for it in ds]
        e0 = ells[0]
        w = max(e.width for e in ells)
        # rebuild with common width
        ells = [Ell.from_data(it, dtype, index_dtype, width=w,
                              fast=False) for it in ds]
        return cls(col_idx=ells[0].col_idx,
                   values=jnp.stack([e.values for e in ells]),
                   row_lengths=ells[0].row_lengths, shape=e0.shape,
                   nnz=e0.nnz)


@linop_dataclass
class BatchIdentity:
    size: int = static_field()
    num_batch: int = static_field(default=1)

    @property
    def shape(self):
        return (self.size, self.size)

    def apply(self, b):
        return b


@linop_dataclass
class BatchMultiVector:
    """batch::MultiVector (``batch_multi_vector.hpp:52``): (nb, n, k) with
    per-entry BLAS reductions — a thin named view over the raw array (which
    is itself accepted everywhere)."""

    data: jnp.ndarray   # (num_batch, n, k)

    @property
    def num_batch_items(self):
        return self.data.shape[0]

    @property
    def shape(self):
        return self.data.shape[1:]

    def compute_dot(self, other):
        o = other.data if isinstance(other, BatchMultiVector) else other
        return jnp.sum(self.data * o, axis=1)            # (nb, k)

    def compute_conj_dot(self, other):
        o = other.data if isinstance(other, BatchMultiVector) else other
        return jnp.sum(jnp.conj(self.data) * o, axis=1)

    def compute_norm2(self):
        return jnp.sqrt(jnp.real(jnp.sum(
            jnp.conj(self.data) * self.data, axis=1)))

    def scale(self, alpha):
        return BatchMultiVector(data=self.data * alpha)

    def add_scaled(self, alpha, other):
        o = other.data if isinstance(other, BatchMultiVector) else other
        return BatchMultiVector(data=self.data + alpha * o)


# ---------------------------------------------------------------------------
# Batch preconditioners
# ---------------------------------------------------------------------------

class _GeneratedBatchPrecond:
    """Per-lane preconditioner: ``arrays`` is vmapped over axis 0 and
    ``make(slice)`` builds each lane's LinOp."""

    def __init__(self, arrays, make):
        self.arrays = arrays
        self.make = make


class BatchJacobi:
    """Scalar/block Jacobi per batch entry (``batch_jacobi.hpp``)."""

    def __init__(self, max_block_size: int = 1):
        self.max_block_size = int(max_block_size)

    def generate(self, A_batch) -> _GeneratedBatchPrecond:
        from .matrix.diagonal import Diagonal
        if self.max_block_size <= 1:
            d = A_batch.extract_diagonals()
            inv = jnp.where(d == 0, jnp.ones_like(d), 1.0 / d)
            return _GeneratedBatchPrecond(
                inv, lambda dd: Diagonal(values=dd))
        from .preconditioner.jacobi import BlockJacobi, _extract_diag_blocks
        n = A_batch.shape[0]
        bs = self.max_block_size
        nblk = -(-n // bs)
        dtype = A_batch.values.dtype

        def invert_one(values_row):
            from .ops.gauss_jordan import batched_inverse
            blocks = _extract_diag_blocks(A_batch.item(values_row), nblk, bs)
            return batched_inverse(blocks)

        inv_blocks = jax.vmap(invert_one)(A_batch.values)
        return _GeneratedBatchPrecond(
            inv_blocks,
            lambda blk: BlockJacobi(inv_blocks=blk, shape=(n, n),
                                    block_size=bs, arith_dtype=dtype))


# ---------------------------------------------------------------------------
# Batch solvers (vmapped whole-Krylov-solve)
# ---------------------------------------------------------------------------

def _batch_criteria(dtype, max_iterations, tolerance, tol_type):
    baseline = "rhs_norm" if tol_type == "relative" else "absolute"
    return Combined(criteria=(
        Iteration(max_iters=max_iterations),
        ResidualNorm(reduction_factor=tolerance, baseline=baseline)))


class _BatchSolver:
    def __init__(self, solve_fn, *, max_iterations=100, tolerance=1e-8,
                 tolerance_type="relative", preconditioner=None):
        self._solve = solve_fn
        self.max_iterations = max_iterations
        self.tolerance = tolerance
        self.tolerance_type = tolerance_type
        self.preconditioner = preconditioner

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A_batch):
        return _GeneratedBatchSolver(self, A_batch)

    def solve(self, A_batch, b, x0=None):
        """b: (num_batch, n) or (num_batch, n, k)."""
        b = jnp.asarray(b)
        squeeze = b.ndim == 2
        if squeeze:
            b = b[..., None]
        crit = _batch_criteria(b.dtype, self.max_iterations, self.tolerance,
                               self.tolerance_type)
        M_gen = (self.preconditioner.generate(A_batch)
                 if self.preconditioner is not None else None)
        M_arrays = None if M_gen is None else M_gen.arrays

        def one(values, b1, x1, m1):
            A1 = A_batch.item(values)
            M1 = M_gen.make(m1) if m1 is not None else None
            return self._solve(A1, b1, x1, criteria=crit, preconditioner=M1)

        in_m = None if M_arrays is None else 0
        x0b = x0 if x0 is not None else jnp.zeros_like(b)
        res = jax.vmap(one, in_axes=(0, 0, 0, in_m))(
            A_batch.values, b, x0b, M_arrays)
        if squeeze:
            res = dataclasses.replace(
                res, x=res.x[..., 0], iterations=res.iterations[..., 0],
                resnorm=res.resnorm[..., 0], converged=res.converged[..., 0])
        from .log import logger as _log
        if _log.has_loggers():
            from jax import core as _jcore
            if not isinstance(res.resnorm, _jcore.Tracer):
                _log.dispatch(_log.BATCH_SOLVE_COMPLETED,
                              num_systems=int(b.shape[0]), result=res)
        return res


class _GeneratedBatchSolver:
    def __init__(self, factory, A_batch):
        self.factory = factory
        self.A_batch = A_batch

    def solve(self, b, x0=None):
        return self.factory.solve(self.A_batch, b, x0)

    def apply(self, b):
        return self.factory.solve(self.A_batch, b).x


def BatchBicgstab(**kw) -> _BatchSolver:
    """batch::solver::Bicgstab (``batch_bicgstab.hpp:50``)."""
    from .solver import bicgstab
    return _BatchSolver(bicgstab.solve, **kw)


def BatchCg(**kw) -> _BatchSolver:
    """batch::solver::Cg (``batch_cg.hpp``)."""
    from .solver import cg
    return _BatchSolver(cg.solve, **kw)
