"""Factorization container.

Analog of ``include/ginkgo/core/factorization/factorization.hpp:76`` /
``core/factorization/factorization.cpp``: holds the factors of A ≈ L·U (or
L·Lᴴ) as a composition, unpackable into the individual operators that the
Ilu/Ic preconditioners and the Direct solver consume.
"""

from __future__ import annotations

from ..base.composition import Composition
from ..base.linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class Factorization(LinOp):
    """L (unit or general lower) and U (upper) factors; for IC, U = Lᴴ."""

    l_factor: LinOp
    u_factor: LinOp
    symmetric: bool = static_field(default=False)

    @property
    def shape(self):
        return (self.l_factor.shape[0], self.u_factor.shape[1])

    def _apply(self, b):
        return self.l_factor._apply(self.u_factor._apply(b))

    def unpack(self):
        return self.l_factor, self.u_factor

    def to_composition(self) -> Composition:
        return Composition(ops=(self.l_factor, self.u_factor))
