"""Shared iterative-solver driver.

Ginkgo factors each solver into an ``apply_dense_impl`` host loop calling
fused per-iteration kernels (``core/solver/cg.cpp:92-180``) with device-side
per-column ``stopping_status``.  Here the whole iteration *is* one jitted
``lax.while_loop`` body: XLA fuses the axpys/dots exactly where Ginkgo's
hand-written ``step_1``/``step_2`` kernels draw the lines, the status mask
lives in the loop carry, and converged columns are frozen by a masked
tree-update (Ginkgo's per-column stopping semantics, multi-RHS included).

Solver-state convention: every array in the state pytree has a trailing
RHS-column axis k — vectors are (n, k), iteration scalars are (k,) — so one
``where(active)`` broadcast freezes stopped columns across the whole state.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..base.linop import LinOp, as_multivector, linop_dataclass, static_field
from ..matrix.dense import compute_norm2
from ..matrix.identity import Identity
from ..stop.criterion import CheckArgs, Criterion, as_criterion

DEFAULT_TRIP_CAP = 100_000


@linop_dataclass
class SolveResult:
    """What Ginkgo's Convergence logger captures, as a return value."""

    x: jnp.ndarray            # solution, caller's rank
    iterations: jnp.ndarray   # (k,) int32 per-column iteration count
    resnorm: jnp.ndarray      # (k,) final recurrent residual norm
    converged: jnp.ndarray    # (k,) bool
    resnorm_history: jnp.ndarray | None = None  # (trips+1, k) if trace=True
    # (k,) bool: the estimate-based criterion fired but the TRUE residual
    # missed the tolerance and retries ran out (restarted solvers).  None
    # for solvers whose recurrent residual is the criterion input.
    stagnated: jnp.ndarray | None = None


def mask_cols(active, new, old):
    """Freeze stopped columns: per-array where() with trailing-k broadcast."""

    def sel(n, o):
        if n.ndim == 0:
            return n  # global scalars advance regardless
        m = active if n.ndim == 1 else active[(None,) * (n.ndim - 1) + (...,)]
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


def prepare_rhs(A, b, x0):
    """Canonicalise b/x0 to (n, k); returns (b2, x2, squeeze).

    ``x0`` may be an array (provided guess), None (zero guess), or one of
    the ``initial_guess_mode`` names 'zero'/'rhs' from Ginkgo's
    ApplyWithInitialGuess (``solver_base.hpp:33``)."""
    if A.shape[0] != A.shape[1]:
        raise ValueError(f"iterative solvers need a square operator, "
                         f"got {A.shape}")
    b2, squeeze = as_multivector(b)
    if b2.shape[0] != A.shape[0]:
        raise ValueError(f"rhs rows {b2.shape[0]} != op rows {A.shape[0]}")
    if x0 is None or (isinstance(x0, str) and x0 == "zero"):
        x2 = jnp.zeros_like(b2)
    elif isinstance(x0, str) and x0 == "rhs":
        x2 = b2
    elif isinstance(x0, str):
        raise ValueError(f"unknown initial_guess_mode {x0!r}")
    else:
        x2, _ = as_multivector(x0)
    return b2, x2, squeeze


def resolve_precond(preconditioner, A):
    """None -> Identity; factory-like (has .generate) -> generate(A)."""
    if preconditioner is None:
        return Identity(size=A.shape[0])
    if hasattr(preconditioner, "generate") and not isinstance(
            preconditioner, LinOp):
        return preconditioner.generate(A)
    return preconditioner


def run_iteration_loop(step_fn, make_check_args, state0, criterion: Criterion,
                       b, r0_norm, b_norm, *, trace: bool = False,
                       trip_cap: int | None = None, restart_fn=None,
                       verify_retries: int = 2):
    """The while_loop driver shared by every Krylov solver.

    On first use the persistent XLA compilation cache is switched on
    (utils/compile_cache.py): the minutes-long first TPU compile of the
    nested-loop solvers (GMRES/GCR) is paid once per machine, not once
    per process.

    step_fn(state) -> state'        one fused iteration (unmasked)
    make_check_args(state, it) -> CheckArgs

    ``restart_fn(state) -> state`` (optional) re-initializes the solver
    from its current iterate with a TRUE residual r = b - A x.  When
    given, estimate-based convergence is AUDITED (the GMRES
    run_restarted_loop mechanism, reference bookkeeping
    benchmark/solver/solver_common.hpp:560,634): once the loop stops,
    the criterion is re-checked against the recomputed residual; a
    column whose recurrent estimate fired but whose true residual
    misses is restarted and continues (up to ``verify_retries`` times
    — a Krylov restart from the true residual is a legitimate
    continuation), after which it reports ``stagnated`` instead of
    claiming a convergence the true residual contradicts.  Hot
    while_loop path only (the trace/host paths keep their post-hoc
    audit semantics).

    With ``trace=True`` runs a fixed-trip ``lax.scan`` instead and returns
    per-iteration residual norms (the SolverProgress logger analog).
    """
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    criterion = as_criterion(criterion)
    crit_state = criterion.init(b, r0_norm, b_norm)
    cap = trip_cap if trip_cap is not None else (
        criterion.max_trip_count() or DEFAULT_TRIP_CAP)
    k = b.shape[1]

    args0 = make_check_args(state0, jnp.int32(0))
    stop0, conv0, crit_state = criterion.check(crit_state, args0)
    carry0 = dict(state=state0, crit=crit_state, it=jnp.int32(0),
                  active=~stop0, converged=conv0,
                  iters=jnp.zeros((k,), jnp.int32))

    # With a single RHS column there is nothing to freeze: the loop exits
    # as soon as the one column stops, so the per-column select (which
    # reads+writes every state buffer, incl. a GMRES basis) is pure waste.
    single_col = b.shape[1] == 1

    def body(carry):
        new_state = step_fn(carry["state"])
        state = (new_state if single_col else
                 mask_cols(carry["active"], new_state, carry["state"]))
        it = carry["it"] + 1
        args = make_check_args(state, it)
        stop, conv, crit = criterion.check(carry["crit"], args)
        newly = carry["active"] & stop
        return dict(
            state=state, crit=crit, it=it,
            active=carry["active"] & ~stop,
            converged=carry["converged"] | (newly & conv),
            iters=carry["iters"] + carry["active"].astype(jnp.int32))

    from ..stop.criterion import has_host_side
    if has_host_side(criterion):
        # host-driven loop (Time criterion / per-iteration logging): the
        # heavy step+mask is jitted ONCE (a single device dispatch per
        # trip); only the criterion check runs eagerly so Time can read
        # the wall clock
        import numpy as np
        from ..log import logger as _log

        @jax.jit
        def fused_step(active, state):
            new_state = step_fn(state)
            return (new_state if single_col else
                    mask_cols(active, new_state, state))

        carry = carry0
        while bool(np.any(np.asarray(carry["active"]))) and \
                int(carry["it"]) < cap:
            state = fused_step(carry["active"], carry["state"])
            it = carry["it"] + 1
            args = make_check_args(state, it)
            stop, conv, crit = criterion.check(carry["crit"], args)
            newly = carry["active"] & stop
            carry = dict(
                state=state, crit=crit, it=it,
                active=carry["active"] & ~stop,
                converged=carry["converged"] | (newly & conv),
                iters=carry["iters"] + carry["active"].astype(jnp.int32))
            if _log.has_loggers():
                _log.dispatch(_log.ITERATION_COMPLETE, iteration=int(it))
                _log.dispatch(_log.CRITERION_CHECK_COMPLETED,
                              iteration=int(it),
                              num_stopped=int(np.sum(np.asarray(stop))),
                              num_converged=int(np.sum(np.asarray(conv
                                                                  & stop))))
        return carry, None

    if not trace:
        def cond(carry):
            return jnp.any(carry["active"]) & (carry["it"] < cap)

        if restart_fn is None:
            final = jax.lax.while_loop(cond, body, carry0)
            return final, None

        def audit(oc):
            c = jax.lax.while_loop(cond, body, oc["carry"])
            s2 = restart_fn(c["state"])
            args = make_check_args(s2, c["it"])
            _, conv_t, crit_t = criterion.check(c["crit"], args)
            # estimate-claimed convergence the true residual contradicts
            bogus = c["converged"] & ~conv_t
            out_of = oc["audits"] >= verify_retries
            redo = bogus & ~out_of
            state = s2 if single_col else mask_cols(redo, s2, c["state"])
            c2 = dict(c, state=state, crit=crit_t, active=redo,
                      converged=c["converged"] & ~bogus)
            return dict(carry=c2,
                        stagnated=oc["stagnated"] | (bogus & out_of),
                        audits=oc["audits"] + 1)

        oc = audit(dict(carry=carry0,
                        stagnated=jnp.zeros((k,), bool),
                        audits=jnp.int32(0)))
        oc = jax.lax.while_loop(
            lambda oc: jnp.any(oc["carry"]["active"])
            & (oc["carry"]["it"] < cap), audit, oc)
        final = dict(oc["carry"], stagnated=oc["stagnated"])
        return final, None

    def scan_body(carry, _):
        do = jnp.any(carry["active"])
        carry = jax.lax.cond(do, body, lambda c: c, carry)
        args = make_check_args(carry["state"], carry["it"])
        return carry, args.get_residual_norm()

    final, history = jax.lax.scan(scan_body, carry0, None, length=cap)
    history = jnp.concatenate([args0.get_residual_norm()[None], history])
    return final, history


def run_restarted_loop(inner_step, cycle_done, restart_fn, make_check_args,
                       state0, criterion: Criterion, b, r0_norm, b_norm,
                       trip_cap: int | None = None, verify_retries: int = 2):
    """Two-level while_loop driver for restarted solvers (GMRES-style).

    The hot inner loop runs ONLY ``inner_step`` + the criterion check — no
    lax.cond — so XLA keeps the big cycle buffers (Krylov basis) aliased in
    place.  A per-iteration cond(restart, step) instead forces the buffers
    through branch-merge copies every trip (measured ~3x on TPU for
    GMRES(30), worse for larger krylov_dim).  ``restart_fn`` runs in the
    outer loop, once per cycle.

    CONVERGENCE IS VERIFIED ON THE TRUE RESIDUAL.  Inner steps stop columns
    on the solver's recurrent estimate (GMRES' ``|g[j+1]|``), which is
    structurally optimistic — especially with a compressed Krylov basis.
    The reference recomputes the residual at every restart
    (``core/solver/gmres.cpp`` residual update in the restart branch); here
    that recompute also *audits* mid-cycle stops: a column whose estimate
    fired is re-checked against the restart's true residual before
    ``converged`` becomes final.  On a miss the column is reactivated for
    another cycle (up to ``verify_retries`` times — restarting from the
    recomputed residual is exactly the restarted-method continuation, so
    retries make real progress); when retries run out it is reported
    ``stagnated`` (converged=False) instead of claiming convergence the
    true residual contradicts.

    Iteration counts tick per inner step only (restarts are free), which
    matches the reference's counting.
    """
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    criterion = as_criterion(criterion)
    crit_state = criterion.init(b, r0_norm, b_norm)
    cap = trip_cap if trip_cap is not None else (
        criterion.max_trip_count() or DEFAULT_TRIP_CAP)
    k = b.shape[1]
    single_col = k == 1

    # state0 comes fresh from the solver's restart_fields, so the initial
    # check runs on the TRUE residual: columns converging here are verified.
    args0 = make_check_args(state0, jnp.int32(0))
    stop0, conv0, crit_state = criterion.check(crit_state, args0)
    carry0 = dict(state=state0, crit=crit_state, it=jnp.int32(0),
                  active=~stop0, converged=conv0, verified=conv0,
                  retries=jnp.zeros((k,), jnp.int32),
                  stagnated=jnp.zeros((k,), bool),
                  iters=jnp.zeros((k,), jnp.int32))

    def inner_body(carry):
        new_state = inner_step(carry["state"])
        state = (new_state if single_col else
                 mask_cols(carry["active"], new_state, carry["state"]))
        it = carry["it"] + 1
        args = make_check_args(state, it)
        stop, conv, crit = criterion.check(carry["crit"], args)
        newly = carry["active"] & stop
        return dict(
            carry, state=state, crit=crit, it=it,
            active=carry["active"] & ~stop,
            # provisional: estimate-based, audited at the next restart
            converged=carry["converged"] | (newly & conv),
            iters=carry["iters"] + carry["active"].astype(jnp.int32))

    def inner_cond(carry):
        return (jnp.any(carry["active"]) & (carry["it"] < cap)
                & ~cycle_done(carry["state"]))

    def outer_body(carry):
        carry = jax.lax.while_loop(inner_cond, inner_body, carry)
        # columns whose estimate-based stop awaits a true-residual audit
        pending = carry["converged"] & ~carry["verified"]
        # outer_cond == (work for active columns) | (pending audits), so
        # whenever this body runs the restart is needed — no cond guard.
        state = restart_fn(carry["state"])
        sel = carry["active"] | pending
        if not single_col:
            state = mask_cols(sel, state, carry["state"])
        # the restart recomputes r = b - A x, so this check is on the TRUE
        # residual; it does not tick `it` (restarts are free)
        args = make_check_args(state, carry["it"])
        stop, conv, crit = criterion.check(carry["crit"], args)
        hit = stop & conv
        # active columns stopping at the boundary are verified by
        # construction (their stop IS the true-residual check)
        newly = carry["active"] & stop
        converged = carry["converged"] | (newly & conv)
        verified = carry["verified"] | (newly & conv)
        active = carry["active"] & ~stop
        # pending columns: confirm, retry another cycle, or give up
        ok = pending & hit
        miss = pending & ~hit
        give_up = miss & (carry["retries"] >= verify_retries)
        redo = miss & ~give_up
        return dict(
            state=state, crit=crit, it=carry["it"],
            active=active | redo,
            converged=converged & ~miss,
            verified=verified | ok,
            retries=carry["retries"] + redo.astype(jnp.int32),
            stagnated=carry["stagnated"] | give_up,
            iters=carry["iters"])

    def outer_cond(carry):
        pending = carry["converged"] & ~carry["verified"]
        return ((jnp.any(carry["active"]) & (carry["it"] < cap))
                | jnp.any(pending))

    final = jax.lax.while_loop(outer_cond, outer_body, carry0)
    return final, None


def finish(final, history, x, r, squeeze):
    """Assemble a SolveResult from loop carry + extracted x, r."""
    resnorm = compute_norm2(r)
    result = SolveResult(
        x=x[:, 0] if squeeze else x,
        iterations=final["iters"],
        resnorm=resnorm,
        converged=final["converged"],
        resnorm_history=history,
        stagnated=final.get("stagnated"))
    from ..log import logger as _log
    if _log.has_loggers():
        import jax.core
        if not isinstance(resnorm, jax.core.Tracer):   # skip inside jit
            _log.dispatch(_log.SOLVE_COMPLETED, result=result)
    return result


def safe_div(num, den):
    """num/den with 0/0 -> 0 (stopped columns carry zeroed updates)."""
    safe = jnp.where(den == 0, jnp.ones_like(den), den)
    return jnp.where(den == 0, jnp.zeros_like(num), num / safe)


# ---------------------------------------------------------------------------
# Solver-as-LinOp + fluent factory machinery.
#
# Ginkgo spells ``Solver::build().with_x(...).on(exec)->generate(A)``
# (``include/ginkgo/core/base/abstract_factory.hpp:394-496``); here each
# solver module exposes ``solve(A, b, ...)`` and the class surface below
# wraps it so ``Bicgstab.build(criteria=...).generate(A)`` yields a LinOp
# usable as an inner solver / preconditioner.
# ---------------------------------------------------------------------------


@linop_dataclass
class SolverOp(LinOp):
    """A generated solver: LinOp whose apply runs ``solve_fn``."""

    system_matrix: LinOp
    preconditioner: object = None
    criteria: object = static_field(default=None)
    solve_fn: object = static_field(default=None)
    name: str = static_field(default="solver")
    params: tuple = static_field(default=())   # extra kwargs, sorted items

    @property
    def shape(self):
        return self.system_matrix.shape

    def _apply(self, b):
        kwargs = dict(self.params)
        if self.preconditioner is not None:
            kwargs["preconditioner"] = self.preconditioner
        return self.solve_fn(self.system_matrix, b, criteria=self.criteria,
                             **kwargs).x

    def solve(self, b, x0=None, **kw):
        kwargs = dict(self.params)
        if self.preconditioner is not None:
            kwargs["preconditioner"] = self.preconditioner
        kwargs.update(kw)
        return self.solve_fn(self.system_matrix, b, x0,
                             criteria=self.criteria, **kwargs)


class SolverFactory:
    """The ``build()`` product: holds params, generates SolverOps."""

    def __init__(self, solve_fn, name, params):
        self.solve_fn = solve_fn
        self.name = name
        self.params = dict(params)

    def generate(self, A) -> SolverOp:
        from ..log import logger as _log
        _log.dispatch(_log.FACTORY_GENERATE_STARTED, op_type=self.name,
                      op_id=id(self))
        params = dict(self.params)
        criteria = params.pop("criteria", None)
        M = params.pop("preconditioner", None)
        if M is not None:
            M = resolve_precond(M, A)
        hashable = tuple(sorted(params.items(), key=lambda kv: kv[0]))
        op = SolverOp(system_matrix=A, preconditioner=M, criteria=criteria,
                      solve_fn=self.solve_fn, name=self.name,
                      params=hashable)
        _log.dispatch(_log.FACTORY_GENERATE_COMPLETED, op_type=self.name,
                      op_id=id(self))
        return op


class SolverAPI:
    """Class-like facade: ``Cg.build(...)`` / ``Cg.solve(A, b, ...)``."""

    def __init__(self, name, solve_fn):
        self.__name__ = self.name = name
        self.solve = solve_fn

    def build(self, **params) -> SolverFactory:
        return SolverFactory(self.solve, self.name, params)

    def __call__(self, **params) -> SolverFactory:
        return self.build(**params)

    def __repr__(self):
        return f"<solver {self.name}>"
