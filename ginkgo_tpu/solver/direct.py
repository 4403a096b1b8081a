"""Direct solver — sparse factorization + triangular solves.

Analog of ``include/ginkgo/core/solver/direct.hpp:33`` /
``core/solver/direct.cpp``: generate runs the (LU or Cholesky)
factorization once; apply is two device-side level-scheduled trisolves.
"""

from __future__ import annotations

from ..base.linop import LinOp, linop_dataclass, static_field
from .triangular import LowerTrs, UpperTrs


@linop_dataclass
class DirectOp(LinOp):
    l_solver: LinOp
    u_solver: LinOp
    shape: tuple = static_field()

    def _apply(self, b):
        return self.u_solver._apply(self.l_solver._apply(b))

    def solve(self, b):
        return self.apply(b)


class Direct:
    """Factory: ``Direct(factorization=Lu()).generate(A)``."""

    def __init__(self, factorization=None):
        self.factorization = factorization

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> DirectOp:
        from ..factorization.direct import Lu
        fact = self.factorization if self.factorization is not None else Lu()
        if hasattr(fact, "generate"):
            fact = fact.generate(A)
        L, U = fact.unpack()
        return DirectOp(l_solver=LowerTrs.build().generate(L),
                        u_solver=UpperTrs.build().generate(U),
                        shape=fact.shape)
