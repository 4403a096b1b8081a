"""Kernel layer: backend registry + reference (jnp) and TPU (Pallas) tiers.

Importing this package registers the reference kernels; the Pallas tier is
imported lazily/optionally since it requires a Mosaic-capable backend.
"""

from . import spmv  # noqa: F401  (registers reference kernels)
from . import spmv_pallas  # noqa: F401  (registers TPU-tier kernels)
from .registry import lookup, register, use_tier, current_tier  # noqa: F401
