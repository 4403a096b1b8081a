"""Identity operator (``include/ginkgo/core/matrix/identity.hpp:35``).

Ginkgo's Identity implements the scale-add apply(alpha,b,beta,x) = alpha*b+beta*x;
also the default (no-op) preconditioner.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class Identity(LinOp):
    size: int = static_field()

    @property
    def shape(self):
        return (self.size, self.size)

    def _apply(self, b):
        return b

    def _apply_advanced(self, alpha, b, beta, x):
        return alpha * b + beta * x

    def to_dense(self):
        return jnp.eye(self.size)
