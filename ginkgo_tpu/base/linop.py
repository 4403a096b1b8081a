"""The operator protocol — TPU-native analog of Ginkgo's ``LinOp``.

Ginkgo unifies matrix / preconditioner / solver behind one abstraction with
two applies (``include/ginkgo/core/base/lin_op.hpp:117``):
``apply(b, x)`` and ``apply(alpha, b, beta, x)``.  Here the same protocol is a
pytree-registered dataclass hierarchy: array fields are pytree leaves (so
operators flow through ``jit`` / ``vmap`` / ``lax.while_loop`` carries), and
structural fields (shapes, strategy names) are static aux data.  ``apply``
is functional: it *returns* the result instead of mutating ``x``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def static_field(**kwargs):
    """A dataclass field that is pytree *aux* data (must be hashable)."""
    kwargs.setdefault("metadata", {})
    kwargs["metadata"] = dict(kwargs["metadata"], static=True)
    return dataclasses.field(**kwargs)


def linop_dataclass(cls):
    """Decorator: dataclass + pytree registration with static-field support."""
    cls = dataclasses.dataclass(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        (meta_fields if f.metadata.get("static") else data_fields).append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


class LinOp:
    """Duck-typed operator protocol. Subclasses are ``linop_dataclass``es with
    a ``shape`` (static) and implement ``_apply(b)`` on 2-D multivectors."""

    shape: tuple[int, int]

    # -- main protocol ------------------------------------------------------
    def apply(self, b):
        """x = Op @ b.  ``b``: (n,) or (n, k); result has matching rank."""
        b2, squeeze = as_multivector(b)
        check_apply_dims(self.shape, b2)
        logging = _log_hook(self, "started")
        out = self._apply(b2)
        if logging:
            _log_hook(self, "completed")
        return out[:, 0] if squeeze else out

    def apply_advanced(self, alpha, b, beta, x):
        """x' = alpha * Op @ b + beta * x  (Ginkgo's 4-arg apply)."""
        b2, squeeze = as_multivector(b)
        x2, _ = as_multivector(x)
        check_apply_dims(self.shape, b2, x2)
        out = self._apply_advanced(alpha, b2, beta, x2)
        return out[:, 0] if squeeze else out

    # -- hooks subclasses may override --------------------------------------
    def _apply(self, b):
        raise NotImplementedError

    def _apply_advanced(self, alpha, b, beta, x):
        return alpha * self._apply(b) + beta * x

    # -- conveniences --------------------------------------------------------
    def __matmul__(self, b):
        if isinstance(b, LinOp):
            from .composition import Composition
            return Composition(ops=(self, b))
        return self.apply(b)

    @property
    def dtype(self):
        leaves = jax.tree_util.tree_leaves(self)
        for leaf in leaves:
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact):
                return leaf.dtype
        return jnp.float32

    def to_dense(self):
        """Materialise as a dense (n, m) array by applying to identity —
        the generic fallback; formats override with direct scatters."""
        n, m = self.shape
        return self._apply(jnp.eye(m, dtype=self.dtype))



def absolute_of_storage(op):
    """|A| entrywise for a *storage* format (AbsoluteComputable mixin): abs
    over every inexact (value) leaf; index/pattern leaves pass through.
    Only valid when the operator's float leaves ARE its entries — storage
    formats opt in by defining ``compute_absolute`` in terms of this helper;
    composite/solver operators deliberately do not (|A·B| != |A|·|B|)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.abs(x)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        else x, op)


def _log_hook(op, phase: str) -> bool:
    """Fire linop_apply_* on the logger bus (host-level; inside jit this
    fires once at trace time, which is what the hint/profile sinks want)."""
    from ..log import logger as _log
    if not _log.has_loggers():
        return False
    _log.dispatch(f"linop_apply_{phase}", op_id=id(op),
                  op_type=type(op).__name__)
    return True


def as_multivector(b):
    """Canonicalise a vector/multivector to 2-D (n, k); returns (b2, squeeze)."""
    b = jnp.asarray(b)
    if b.ndim == 1:
        return b[:, None], True
    if b.ndim == 2:
        return b, False
    from .exceptions import BadDimension
    raise BadDimension(
        f"expected rank-1/2 multivector, got shape {b.shape}")


def check_apply_dims(op_shape, b, x=None):
    """Ginkgo's GKO_ASSERT_CONFORMANT analog (trace-time, static shapes)."""
    from .exceptions import DimensionMismatch
    n, m = op_shape
    if b.shape[0] != m:
        raise DimensionMismatch(
            f"dimension mismatch: op {op_shape} @ b {b.shape}")
    if x is not None and x.shape[0] != n:
        raise DimensionMismatch(
            f"dimension mismatch: op {op_shape} -> x {x.shape}")
