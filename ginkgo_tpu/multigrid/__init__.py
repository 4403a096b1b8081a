"""Multigrid components (core/multigrid analogs)."""

from .pgm import (AggProlong, AggRestrict, FixedCoarsening,  # noqa: F401
                  MultigridLevel, Pgm)
from .distributed_pgm import DistributedPgm  # noqa: F401
