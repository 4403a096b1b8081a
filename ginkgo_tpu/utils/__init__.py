"""Utilities: generators, timers, checkpointing, sparse interop."""

from . import generators  # noqa: F401
from .timer import CpuTimer, DeviceTimer, topology  # noqa: F401
from . import checkpoint  # noqa: F401
from .interop import (from_scipy, to_scipy, from_bcoo,  # noqa: F401
                      to_bcoo, from_bcsr, to_bcsr)
