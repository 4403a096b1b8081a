"""Composite operators.

Analogs of Ginkgo's ``Composition`` (op1 @ op2 @ ...,
``include/ginkgo/core/base/composition.hpp:39``), ``Combination``
(sum_i alpha_i * op_i, ``combination.hpp:31``), ``Perturbation``
(I + scalar * basis @ projector^H, ``perturbation.hpp:38``) and
``BlockOperator`` (``block_operator.hpp:76``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class Composition(LinOp):
    """x = op_0 @ (op_1 @ (... @ b))."""

    ops: tuple

    def __post_init__(self):
        for a, b in zip(self.ops[:-1], self.ops[1:]):
            if a.shape[1] != b.shape[0]:
                raise ValueError("non-conformant composition")

    @property
    def shape(self):
        return (self.ops[0].shape[0], self.ops[-1].shape[1])

    def _apply(self, b):
        for op in reversed(self.ops):
            b = op._apply(b)
        return b


@linop_dataclass
class Combination(LinOp):
    """x = sum_i coefficients[i] * operators[i] @ b."""

    coefficients: tuple  # scalars (traced or python)
    operators: tuple

    @property
    def shape(self):
        return self.operators[0].shape

    def _apply(self, b):
        out = self.coefficients[0] * self.operators[0]._apply(b)
        for c, op in zip(self.coefficients[1:], self.operators[1:]):
            out = out + c * op._apply(b)
        return out


@linop_dataclass
class Perturbation(LinOp):
    """x = (I + scalar * basis @ projector) @ b."""

    scalar: object
    basis: LinOp
    projector: LinOp

    @property
    def shape(self):
        n = self.basis.shape[0]
        return (n, self.projector.shape[1])

    def _apply(self, b):
        return b + self.scalar * self.basis._apply(self.projector._apply(b))


@linop_dataclass
class BlockOperator(LinOp):
    """Block operator from a 2-D grid of LinOps (None = zero block)."""

    blocks: tuple  # tuple of tuples of (LinOp | None)

    @property
    def shape(self):
        rows = sum(next(b for b in row if b is not None).shape[0]
                   for row in self.blocks)
        cols = sum(next(row[j] for row in self.blocks
                        if row[j] is not None).shape[1]
                   for j in range(len(self.blocks[0])))
        return (rows, cols)

    def _apply(self, b):
        col_sizes = [next(row[j] for row in self.blocks
                          if row[j] is not None).shape[1]
                     for j in range(len(self.blocks[0]))]
        col_offs = [0]
        for s in col_sizes:
            col_offs.append(col_offs[-1] + s)
        out_rows = []
        for row in self.blocks:
            acc = None
            for j, op in enumerate(row):
                if op is None:
                    continue
                part = op._apply(b[col_offs[j]:col_offs[j + 1]])
                acc = part if acc is None else acc + part
            out_rows.append(acc)
        return jnp.concatenate(out_rows, axis=0)
