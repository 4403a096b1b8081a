"""Utilities: generators, timers, checkpointing."""

from . import generators  # noqa: F401
from .timer import CpuTimer, DeviceTimer, topology  # noqa: F401
from . import checkpoint  # noqa: F401
