"""ProfilerHook — ranges for external profilers + built-in summary.

Analog of ``include/ginkgo/core/log/profiler_hook.hpp:57`` (NVTX/ROCTX/TAU/
VTune range converters + ``create_summary:347``).  TPU mapping: ranges are
``jax.profiler.TraceAnnotation``s (visible in XLA/TensorBoard traces, the
NVTX analog) and the built-in summary measures host wall-time per named
range with block_until_ready semantics left to the caller.
"""

from __future__ import annotations

import contextlib
import time

from .logger import (LINOP_APPLY_COMPLETED, LINOP_APPLY_STARTED,
                     FACTORY_GENERATE_COMPLETED, FACTORY_GENERATE_STARTED,
                     SOLVE_COMPLETED, SOLVE_STARTED, Logger)


class ProfilerHook(Logger):
    """Collects begin/end event pairs into named ranges.

    ``create_summary()`` -> a nested dict of {name: (count, total_s)};
    ``write_summary()`` -> markdown table (profiler_hook_summary_writer
    analog).  Use ``create_tracer()`` for jax.profiler TraceAnnotations.
    """

    _BEGIN_END = {
        LINOP_APPLY_STARTED: LINOP_APPLY_COMPLETED,
        FACTORY_GENERATE_STARTED: FACTORY_GENERATE_COMPLETED,
        SOLVE_STARTED: SOLVE_COMPLETED,
    }

    def __init__(self):
        super().__init__()
        self._open: dict[tuple, float] = {}
        self.ranges: dict[str, list[float]] = {}

    def on(self, event, **data):
        name = data.get("op_type") or data.get("solver") or event
        key = (event.rsplit("_", 1)[0], name, data.get("op_id"))
        if event.endswith("_started"):
            self._open[key] = time.perf_counter()
        elif event.endswith("_completed"):
            t0 = self._open.pop(key, None)
            if t0 is not None:
                self.ranges.setdefault(str(name), []).append(
                    time.perf_counter() - t0)

    def create_summary(self):
        return {name: (len(ts), sum(ts)) for name, ts in self.ranges.items()}

    def write_summary(self, stream=None) -> str:
        lines = ["| range | count | total [s] | avg [s] |",
                 "|---|---|---|---|"]
        for name, (cnt, tot) in sorted(self.create_summary().items(),
                                       key=lambda kv: -kv[1][1]):
            lines.append(f"| {name} | {cnt} | {tot:.6f} | {tot / cnt:.6f} |")
        out = "\n".join(lines)
        if stream is not None:
            stream.write(out + "\n")
        return out


@contextlib.contextmanager
def annotate(name: str):
    """One named profiler range (TraceAnnotation = NVTX-range analog)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a full XLA trace viewable in TensorBoard/Perfetto
    (``jax.profiler.trace``), the deep-profiling path."""
    import jax
    with jax.profiler.trace(logdir):
        yield
