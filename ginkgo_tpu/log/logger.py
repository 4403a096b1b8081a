"""Event-hook logger bus.

Analog of ``include/ginkgo/core/log/logger.hpp:110-547`` (27 masked event
slots fanned out from Executor/LinOp/Criterion) resized for a JAX runtime:
*device-side* per-iteration events are impossible under jit without host
syncs, so the bus carries **host-level** events — operation/apply begin-end,
factory generate, solve completion (with the device-computed Convergence
payload), IO — and the per-iteration channel is the ``trace=True`` history
(SolverProgress) which costs one extra scan output instead of a host sync
per iteration.

Loggers subscribe globally (``add_logger``) or per ``with capture(logger):``
scope; events carry kwargs.  Masks mirror Ginkgo's event grouping.
"""

from __future__ import annotations

import contextlib
import sys
import time

# event names (logger.hpp event slots, host-level subset)
LINOP_APPLY_STARTED = "linop_apply_started"
LINOP_APPLY_COMPLETED = "linop_apply_completed"
FACTORY_GENERATE_STARTED = "linop_factory_generate_started"
FACTORY_GENERATE_COMPLETED = "linop_factory_generate_completed"
SOLVE_STARTED = "solve_started"
SOLVE_COMPLETED = "solve_completed"
ITERATION_COMPLETE = "iteration_complete"   # chunked/host-loop mode only
IO_READ = "io_read"
IO_WRITE = "io_write"
PERFORMANCE_FALLBACK = "performance_fallback"   # kernel left its fast tier
# criterion_check_completed analog (host-loop mode; per check)
CRITERION_CHECK_COMPLETED = "criterion_check_completed"
# batch::log::BatchConvergence analog: fires once per batch solve with
# the per-system iterations/residuals in the result
BATCH_SOLVE_COMPLETED = "batch_solve_completed"

ALL_EVENTS = frozenset({
    LINOP_APPLY_STARTED, LINOP_APPLY_COMPLETED, FACTORY_GENERATE_STARTED,
    FACTORY_GENERATE_COMPLETED, SOLVE_STARTED, SOLVE_COMPLETED,
    ITERATION_COMPLETE, IO_READ, IO_WRITE, PERFORMANCE_FALLBACK,
    CRITERION_CHECK_COMPLETED, BATCH_SOLVE_COMPLETED,
})


class Logger:
    """Base logger; subclasses implement ``on(event, **data)``.
    ``events_mask`` restricts delivery (Ginkgo's mask_type)."""

    def __init__(self, events_mask=None):
        self.events_mask = (frozenset(events_mask) if events_mask is not None
                            else ALL_EVENTS)

    def on(self, event: str, **data):
        raise NotImplementedError

    def wants(self, event: str) -> bool:
        return event in self.events_mask


_global_loggers: list[Logger] = []


def add_logger(logger: Logger):
    _global_loggers.append(logger)
    return logger


def remove_logger(logger: Logger):
    _global_loggers.remove(logger)


@contextlib.contextmanager
def capture(*loggers: Logger):
    """Scope-local logger registration."""
    for lg in loggers:
        add_logger(lg)
    try:
        yield loggers[0] if len(loggers) == 1 else loggers
    finally:
        for lg in loggers:
            remove_logger(lg)


def dispatch(event: str, **data):
    for lg in _global_loggers:
        if lg.wants(event):
            lg.on(event, **data)


def has_loggers() -> bool:
    return bool(_global_loggers)


# ---------------------------------------------------------------------------
# Sinks (core/log/* analogs)
# ---------------------------------------------------------------------------

class Stream(Logger):
    """Text-trace sink (``log/stream.hpp:30``)."""

    def __init__(self, stream=None, events_mask=None):
        super().__init__(events_mask)
        self.stream = stream if stream is not None else sys.stderr

    def on(self, event, **data):
        parts = ", ".join(f"{k}={_short(v)}" for k, v in data.items())
        self.stream.write(f"[ginkgo_tpu] {event}: {parts}\n")


class Record(Logger):
    """In-memory event ring (``log/record.hpp:215``)."""

    def __init__(self, max_storage: int = 0, events_mask=None):
        super().__init__(events_mask)
        self.max_storage = max_storage
        self.data: list[tuple[str, dict]] = []

    def on(self, event, **data):
        self.data.append((event, data))
        if self.max_storage and len(self.data) > self.max_storage:
            self.data.pop(0)


class Convergence(Logger):
    """Captures the last solve's iteration count / residual norm
    (``log/convergence.hpp:37``)."""

    def __init__(self):
        super().__init__({SOLVE_COMPLETED})
        self.result = None

    def on(self, event, **data):
        self.result = data.get("result")

    @property
    def num_iterations(self):
        import numpy as np
        return (None if self.result is None
                else int(np.max(np.asarray(self.result.iterations))))

    @property
    def residual_norm(self):
        import numpy as np
        return (None if self.result is None
                else np.asarray(self.result.resnorm))

    def has_converged(self):
        import numpy as np
        return (self.result is not None
                and bool(np.asarray(self.result.converged).all()))


class SolverProgress(Logger):
    """Per-iteration residual table (``log/solver_progress.hpp:24``) — fed
    by solves run with ``trace=True`` (the resnorm_history channel)."""

    def __init__(self, stream=None):
        super().__init__({SOLVE_COMPLETED})
        self.stream = stream
        self.history = None

    def on(self, event, **data):
        import numpy as np
        res = data.get("result")
        if res is None or res.resnorm_history is None:
            return
        self.history = np.asarray(res.resnorm_history)
        if self.stream is not None:
            for it, row in enumerate(self.history):
                self.stream.write(f"{it}\t" + "\t".join(
                    f"{v:.6e}" for v in np.atleast_1d(row)) + "\n")


class PerformanceHint(Logger):
    """Detects wasteful usage patterns (``log/performance_hint.hpp:29``):
    repeated non-jitted applies of the same operator, tiny-solve overhead."""

    def __init__(self, stream=None, threshold: int = 10):
        super().__init__({LINOP_APPLY_COMPLETED, PERFORMANCE_FALLBACK})
        self.stream = stream if stream is not None else sys.stderr
        self.threshold = threshold
        self._counts: dict[int, int] = {}
        self._warned: set[int] = set()

    def on(self, event, **data):
        if event == PERFORMANCE_FALLBACK:
            key = ("fallback", data.get("kernel"), data.get("reason"))
            if key not in self._warned:
                self._warned.add(key)
                self.stream.write(
                    f"[ginkgo_tpu hint] {data.get('kernel')} fell back to "
                    f"the slow reference tier: {data.get('reason')}\n")
            return
        key = data.get("op_id")
        if key is None:
            return
        self._counts[key] = self._counts.get(key, 0) + 1
        if (self._counts[key] == self.threshold
                and key not in self._warned):
            self._warned.add(key)
            self.stream.write(
                f"[ginkgo_tpu hint] operator {data.get('op_type')} applied "
                f"{self.threshold}x outside jit — wrap the loop in jax.jit "
                "to avoid per-call dispatch overhead\n")


def _short(v):
    s = repr(v)
    return s if len(s) <= 60 else s[:57] + "..."
