"""ILU / IC apply preconditioners.

Analog of ``include/ginkgo/core/preconditioner/ilu.hpp:114`` / ``ic.hpp:109``:
couples the L/U (or L/Lᴴ) triangular solves from a factorization into
``M⁻¹ = U⁻¹ L⁻¹``.  The ``l_solver``/``u_solver`` factories default to exact
level-scheduled triangular solves; pass ``LowerTrs.build(algorithm='jacobi',
sweeps=k)`` for Ginkgo's relaxed-trisolve setup, or any solver factory (e.g.
an IR-wrapped one) — the ``with_l_solver`` generality of ilu.hpp:64-99.
"""

from __future__ import annotations

from ..base.linop import LinOp, linop_dataclass, static_field
from ..solver.triangular import LowerTrs, UpperTrs


@linop_dataclass
class IluApply(LinOp):
    """Generated ILU preconditioner: x = U⁻¹ (L⁻¹ b)."""

    l_solver: LinOp
    u_solver: LinOp
    shape: tuple = static_field()

    def _apply(self, b):
        return self.u_solver._apply(self.l_solver._apply(b))


class Ilu:
    """Factory: ``Ilu(factorization=ParIlu()).generate(A)``.

    ``factorization``: a factorization factory (ParIlu/Ilu0/ParIlut...) or an
    already-generated Factorization; defaults to exact ILU(0).
    """

    def __init__(self, factorization=None, l_solver=None, u_solver=None):
        self.factorization = factorization
        self.l_solver = l_solver
        self.u_solver = u_solver

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> IluApply:
        from ..factorization.par_ilu import Ilu0
        fact = self.factorization
        if fact is None:
            fact = Ilu0()
        if hasattr(fact, "generate"):
            fact = fact.generate(A)
        L, U = fact.unpack()
        lf = self.l_solver if self.l_solver is not None else LowerTrs.build()
        uf = self.u_solver if self.u_solver is not None else UpperTrs.build()
        return IluApply(l_solver=lf.generate(L), u_solver=uf.generate(U),
                        shape=fact.shape)


class Ic:
    """Factory: IC preconditioner M⁻¹ = L⁻ᴴ L⁻¹ (``ic.hpp:109``;
    ``u_solver`` is the reference's lh_solver slot)."""

    def __init__(self, factorization=None, l_solver=None, u_solver=None):
        self.factorization = factorization
        self.l_solver = l_solver
        self.u_solver = u_solver

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> IluApply:
        from ..factorization.par_ilu import Ic0
        fact = self.factorization
        if fact is None:
            fact = Ic0()
        if hasattr(fact, "generate"):
            fact = fact.generate(A)
        L, Lt = fact.unpack()
        lf = self.l_solver if self.l_solver is not None else LowerTrs.build()
        uf = self.u_solver if self.u_solver is not None else UpperTrs.build()
        return IluApply(l_solver=lf.generate(L), u_solver=uf.generate(Lt),
                        shape=fact.shape)
