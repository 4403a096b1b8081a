"""Preconditioners (core/preconditioner analogs)."""

from .jacobi import BlockJacobi, Jacobi  # noqa: F401
from .ilu import Ic, Ilu, IluApply  # noqa: F401
from .isai import Isai  # noqa: F401
from .sor import GaussSeidel, Sor  # noqa: F401
