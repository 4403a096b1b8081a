"""Krylov and relaxation solvers (``core/solver/`` analogs)."""

from . import cg  # noqa: F401
from .common import SolveResult  # noqa: F401
