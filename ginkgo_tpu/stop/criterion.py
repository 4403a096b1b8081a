"""Stopping criteria.

Analog of Ginkgo's ``stop::Criterion`` event machinery
(``include/ginkgo/core/stop/criterion.hpp:36-105``) and ``stopping_status``:
per-RHS-column status lives in a small int array carried through the
``lax.while_loop``; criteria are dataclass configs exposing

    init(args)  -> state           (captures baselines at solve start)
    check(state, args) -> (stop_mask (k,) bool, converged_mask, state)

where ``args`` is a :class:`CheckArgs` carrying whatever the solver has on
hand (iteration counter, recurrent residual / its norm, implicit squared
norm) — mirroring the updater fields of ``criterion.hpp:62-105``.

Status encoding (per column, int32): 0 = active; ``STOPPED | (id << 2)`` when
some criterion fired; bit 0 marks convergence, bit 1 marks plain stop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from ..base.linop import linop_dataclass, static_field
from ..matrix.dense import compute_norm2

CONVERGED = 1
STOPPED = 2


@linop_dataclass
class CheckArgs:
    """What the solver can offer the criteria this iteration."""

    iteration: jnp.ndarray                     # scalar int
    residual: Optional[jnp.ndarray] = None     # (n, k) recurrent residual
    residual_norm: Optional[jnp.ndarray] = None        # (k,)
    implicit_sq_residual_norm: Optional[jnp.ndarray] = None  # (k,)
    solution: Optional[jnp.ndarray] = None     # (n, k)

    def get_residual_norm(self):
        if self.residual_norm is not None:
            return self.residual_norm
        if self.residual is not None:
            return compute_norm2(self.residual)
        if self.implicit_sq_residual_norm is not None:
            return jnp.sqrt(jnp.abs(self.implicit_sq_residual_norm))
        raise ValueError("criterion needs a residual but solver gave none")


class Criterion:
    """Base: subclasses are linop_dataclasses implementing init/check."""

    def init(self, b, r0_norm, b_norm):
        return ()

    def check(self, state, args: CheckArgs):
        raise NotImplementedError

    # hard trip-count bound for the while_loop (None = unbounded)
    def max_trip_count(self):
        return None

    def __or__(self, other):
        mine = list(self.criteria) if isinstance(self, Combined) else [self]
        theirs = list(other.criteria) if isinstance(other, Combined) else [other]
        return Combined(criteria=tuple(mine + theirs))


@linop_dataclass
class Iteration(Criterion):
    """Stop (not converged) after ``max_iters`` iterations
    (``include/ginkgo/core/stop/iteration.hpp:25``)."""

    max_iters: int = static_field(default=1000)

    def check(self, state, args):
        stop = args.iteration >= self.max_iters
        k = _num_cols(args)
        return jnp.broadcast_to(stop, (k,)), jnp.zeros((k,), bool), state

    def max_trip_count(self):
        return self.max_iters


@linop_dataclass
class ResidualNorm(Criterion):
    """||r|| <= reduction_factor * baseline
    (``include/ginkgo/core/stop/residual_norm.hpp:37``); baseline is one of
    ``rhs_norm`` (default), ``initial_resnorm``, ``absolute``."""

    reduction_factor: float = static_field(default=1e-8)
    baseline: str = static_field(default="rhs_norm")

    def init(self, b, r0_norm, b_norm):
        if self.baseline == "rhs_norm":
            return b_norm
        if self.baseline == "initial_resnorm":
            return r0_norm
        if self.baseline == "absolute":
            return jnp.ones_like(b_norm)
        raise ValueError(f"unknown baseline {self.baseline!r}")

    def check(self, state, args):
        norm = args.get_residual_norm()
        conv = norm <= self.reduction_factor * state
        return conv, conv, state


@linop_dataclass
class ImplicitResidualNorm(Criterion):
    """Like ResidualNorm but on sqrt(|implicit rho|) — free in CG-type solvers
    (``residual_norm.hpp:113``)."""

    reduction_factor: float = static_field(default=1e-8)
    baseline: str = static_field(default="rhs_norm")

    def init(self, b, r0_norm, b_norm):
        return ResidualNorm.init(self, b, r0_norm, b_norm)

    def check(self, state, args):
        if args.implicit_sq_residual_norm is not None:
            norm = jnp.sqrt(jnp.abs(args.implicit_sq_residual_norm))
        else:
            norm = args.get_residual_norm()
        conv = norm <= self.reduction_factor * state
        return conv, conv, state


@linop_dataclass
class Time(Criterion):
    """Wall-clock limit (``include/ginkgo/core/stop/time.hpp:24``).

    Host-side: reads the real clock, so a solve whose criteria include Time
    runs in the host-driven loop mode (one jitted step per trip) instead of
    a single device while_loop — the analog of Ginkgo's CPU-side time check
    against device-resident iteration state."""

    time_limit: float = static_field(default=10.0)   # seconds
    host_side = True

    def init(self, b, r0_norm, b_norm):
        import time
        return time.perf_counter()

    def check(self, state, args):
        import time
        k = _num_cols(args)
        stop = time.perf_counter() - state > self.time_limit
        return (jnp.broadcast_to(jnp.asarray(stop), (k,)),
                jnp.zeros((k,), bool), state)


def has_host_side(crit) -> bool:
    if getattr(crit, "host_side", False):
        return True
    if isinstance(crit, Combined):
        return any(has_host_side(c) for c in crit.criteria)
    return False


@linop_dataclass
class Combined(Criterion):
    """OR-composition (``include/ginkgo/core/stop/combined.hpp:26``)."""

    criteria: tuple = static_field(default=())

    def init(self, b, r0_norm, b_norm):
        return tuple(c.init(b, r0_norm, b_norm) for c in self.criteria)

    def check(self, state, args):
        stops, convs, states = [], [], []
        for c, s in zip(self.criteria, state):
            st, cv, ns = c.check(s, args)
            stops.append(st)
            convs.append(cv)
            states.append(ns)
        stop = stops[0]
        conv = convs[0]
        for st, cv in zip(stops[1:], convs[1:]):
            stop = stop | st
            conv = conv | cv
        return stop, conv, tuple(states)

    def max_trip_count(self):
        counts = [c.max_trip_count() for c in self.criteria]
        counts = [c for c in counts if c is not None]
        return min(counts) if counts else None


def default_criterion(dtype, max_iters=1000, reduction_factor=None):
    """Iteration | ResidualNorm(rhs-relative) — the benchmark-suite default
    (``benchmark/solver/solver_common.hpp:120``)."""
    from ..base.dtypes import eps
    rf = reduction_factor if reduction_factor is not None else eps(dtype) * 1e3
    return Combined(criteria=(Iteration(max_iters=max_iters),
                              ResidualNorm(reduction_factor=rf)))


def as_criterion(obj) -> Criterion:
    if obj is None:
        raise ValueError("a stopping criterion is required")
    if isinstance(obj, Combined) and not obj.criteria:
        raise ValueError("Combined criterion needs at least one member")
    if isinstance(obj, Criterion):
        return obj
    if isinstance(obj, (list, tuple)):
        if not obj:
            raise ValueError("criteria list must not be empty")
        return Combined(criteria=tuple(obj))
    raise TypeError(f"not a criterion: {obj!r}")


def _num_cols(args: CheckArgs) -> int:
    for f in (args.residual_norm, args.implicit_sq_residual_norm):
        if f is not None:
            return f.shape[0]
    for f in (args.residual, args.solution):
        if f is not None:
            return f.shape[1]
    return 1
