"""Sparse-ecosystem interop: scipy.sparse and jax.experimental.sparse.

The reference's external-interfacing story is matrix assembly through
``gko::matrix_data`` / ``gko::read`` (``include/ginkgo/core/base/
matrix_data.hpp``, ``examples/external-lib-interfacing``); the Python/TPU
analog is the two sparse ecosystems a JAX user actually holds data in:

* **scipy.sparse** — the host assembly lingua franca.  ``from_scipy`` /
  ``to_scipy`` round-trip any scipy format through :class:`MatrixData`
  (host tier, numpy buffers, no device traffic until the operator is
  built).
* **jax.experimental.sparse** — BCOO/BCSR arrays already living on a
  device.  ``from_bcoo`` / ``from_bcsr`` build a ginkgo_tpu operator
  (choosing the fast SpMV layout at build time, like every other
  constructor); ``to_bcoo`` / ``to_bcsr`` export back so results can
  feed code written against the JAX sparse API.

Construction is host-symbolic by design (dynamic sizes live on the host
— see docs/DESIGN.md): device inputs are pulled once, canonicalized,
and re-uploaded in the chosen static layout.  Dense (``n_dense``) and
batch (``n_batch``) BCOO dimensions have no 2-D-operator analog and
raise :class:`NotSupportedError`.
"""

from __future__ import annotations

import numpy as np

from ..base.exceptions import NotSupportedError
from ..base.matrix_data import MatrixData

__all__ = ["from_scipy", "to_scipy", "from_bcoo", "to_bcoo",
           "from_bcsr", "to_bcsr"]


def _data_of(op) -> MatrixData:
    """Canonical (row-major sorted, duplicate-free) data of an export source.

    Formats like Coo expose ``to_matrix_data`` in *stored* order, which may
    be unsorted or contain duplicates; the exporters below stamp
    ``indices_sorted``/``unique_indices`` and compute ``row_ptrs``, both of
    which require canonical order.  ``sum_duplicates`` is a cheap
    one-pass no-op for already-canonical data and, unlike ``canonical()``,
    keeps explicit zeros (pattern entries survive the round-trip)."""
    if isinstance(op, MatrixData):
        return op.sum_duplicates()
    return op.to_matrix_data().sum_duplicates()


def from_scipy(m, cls=None, **kwargs):
    """Build a ginkgo_tpu operator from any scipy.sparse matrix/array.

    Duplicate entries are summed (scipy COO semantics); explicit zeros
    are dropped (``Csr.from_data`` canonicalizes, which includes
    ``remove_zeros`` — matching the reference's read path).  ``cls``
    picks the target format (default :class:`~ginkgo_tpu.Csr`); extra
    kwargs reach its ``from_data`` (``strategy=...``, ``dtype=...``).
    """
    import scipy.sparse as sp
    if not sp.issparse(m):
        raise TypeError(f"expected a scipy.sparse matrix, got {type(m)!r}")
    coo = m.tocoo()
    data = MatrixData(tuple(coo.shape), coo.row.astype(np.int64),
                      coo.col.astype(np.int64), np.asarray(coo.data))
    if cls is None:
        from ..matrix.csr import Csr as cls
    return cls.from_data(data, **kwargs)


def to_scipy(op, format: str = "csr"):
    """Export an operator (or MatrixData) as a scipy.sparse matrix."""
    import scipy.sparse as sp
    d = _data_of(op)
    out = sp.coo_matrix((d.values, (d.row_idx, d.col_idx)), shape=d.shape)
    return out.asformat(format)


def _check_unbatched(mat, kind):
    n_batch = getattr(mat, "n_batch", 0)
    n_dense = getattr(mat, "n_dense", 0)
    if n_batch or n_dense or len(mat.shape) != 2:
        raise NotSupportedError(
            f"{kind} with n_batch={n_batch}, n_dense={n_dense}, "
            f"shape={mat.shape}: only plain 2-D sparse operators map to "
            "ginkgo_tpu LinOps (use ginkgo_tpu.batch for batched systems)")


def from_bcoo(mat, cls=None, **kwargs):
    """Build an operator from a ``jax.experimental.sparse.BCOO``."""
    _check_unbatched(mat, "BCOO")
    idx = np.asarray(mat.indices)
    data = MatrixData(tuple(mat.shape), idx[:, 0].astype(np.int64),
                      idx[:, 1].astype(np.int64), np.asarray(mat.data))
    if cls is None:
        from ..matrix.csr import Csr as cls
    return cls.from_data(data, **kwargs)


def from_bcsr(mat, cls=None, **kwargs):
    """Build an operator from a ``jax.experimental.sparse.BCSR``."""
    _check_unbatched(mat, "BCSR")
    indptr = np.asarray(mat.indptr).astype(np.int64)
    rows = np.repeat(np.arange(mat.shape[0], dtype=np.int64),
                     np.diff(indptr))
    data = MatrixData(tuple(mat.shape), rows,
                      np.asarray(mat.indices).astype(np.int64),
                      np.asarray(mat.data))
    if cls is None:
        from ..matrix.csr import Csr as cls
    return cls.from_data(data, **kwargs)


def to_bcoo(op):
    """Export an operator (or MatrixData) as a sorted, unique BCOO."""
    import jax.numpy as jnp
    from jax.experimental import sparse
    d = _data_of(op)
    indices = jnp.stack([jnp.asarray(d.row_idx, jnp.int32),
                         jnp.asarray(d.col_idx, jnp.int32)], axis=1)
    return sparse.BCOO((jnp.asarray(d.values), indices), shape=d.shape,
                       indices_sorted=True, unique_indices=True)


def to_bcsr(op):
    """Export an operator (or MatrixData) as a BCSR."""
    import jax.numpy as jnp
    from jax.experimental import sparse
    d = _data_of(op)
    return sparse.BCSR((jnp.asarray(d.values),
                        jnp.asarray(d.col_idx, jnp.int32),
                        jnp.asarray(d.row_ptrs(), jnp.int32)),
                       shape=d.shape, indices_sorted=True,
                       unique_indices=True)
