"""Timers (``include/ginkgo/core/base/timer.hpp:80,146,166`` analogs).

``CpuTimer`` measures host wall time; ``DeviceTimer`` brackets device work
with ``block_until_ready`` barriers (the Event-based CudaTimer analog —
XLA's async dispatch plays the role of stream asynchrony here).
"""

from __future__ import annotations

import time


class CpuTimer:
    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        self.elapsed += time.perf_counter() - self._t0
        return self.elapsed


class DeviceTimer:
    """Times device work: ``toc(result)`` blocks on the result first so the
    measured span covers actual execution, not dispatch."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def tic(self):
        import jax
        # drain previously enqueued work so we start from idle
        jax.effects_barrier()
        self._t0 = time.perf_counter()

    def toc(self, *results) -> float:
        import jax
        for r in results:
            jax.block_until_ready(r)
        self.elapsed += time.perf_counter() - self._t0
        return self.elapsed


def topology():
    """machine_topology analog: the visible device inventory."""
    import jax
    return {
        "backend": jax.default_backend(),
        "num_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "devices": [dict(id=d.id, kind=d.device_kind,
                         platform=d.platform,
                         process=d.process_index)
                    for d in jax.devices()],
    }
