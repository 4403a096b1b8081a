"""Iterative refinement / (preconditioned) Richardson.

Analog of ``core/solver/ir.cpp`` (``include/ginkgo/core/solver/ir.hpp:81``):
``x += relaxation_factor * solver(b - A x)`` with a pluggable inner solver
(Ginkgo's ``with_solver``; identity by default = plain Richardson).  This is
the host of the mixed-precision-IR pattern: pass an inner solver generated at
lower precision (``ir-ilu-preconditioned-solver`` / ``mixed-precision-ir``
examples).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base.dtypes import complex_dtype, is_complex
from ..matrix.dense import compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (SolverAPI, finish, prepare_rhs, resolve_precond,
                     run_iteration_loop)


def solve(A, b, x0=None, *, criteria=None, solver=None, preconditioner=None,
          relaxation_factor=1.0, trace: bool = False):
    """Solve A x = b with iterative refinement. Jit-compatible.

    ``solver``: the inner correction solver (LinOp or factory); Ginkgo's
    ``with_solver``.  ``preconditioner`` is accepted as an alias so IR slots
    into the generic factory machinery.
    """
    b2, x, squeeze = prepare_rhs(A, b, x0)
    inner = solver if solver is not None else preconditioner
    S = resolve_precond(inner, A)
    if criteria is None:
        criteria = default_criterion(b2.dtype)
    omega = jnp.asarray(relaxation_factor, b2.dtype)

    r = b2 - A._apply(x)
    state = dict(x=x, r=r)
    b_norm = compute_norm2(b2)
    r0_norm = compute_norm2(r)

    # Inner-solver working precision (the mixed-precision-IR hook).  Cast to
    # the inner solver's storage precision only when it actually stores
    # values (the default Identity has none — its LinOp.dtype fallback is
    # f32, and casting a complex residual through it would silently drop
    # the imaginary part), and keep the complex domain: a real-storage
    # inner solver applied to a complex residual runs in the matching
    # complex precision.
    has_values = any(
        hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact)
        for leaf in jax.tree_util.tree_leaves(S))
    inner_dt = S.dtype if has_values else b2.dtype
    if is_complex(b2.dtype) and not is_complex(inner_dt):
        inner_dt = complex_dtype(inner_dt)

    def step(s):
        d = S._apply(s["r"].astype(inner_dt)).astype(s["r"].dtype)
        x = s["x"] + omega * d
        return dict(x=x, r=b2 - A._apply(x))

    def make_check_args(s, it):
        return CheckArgs(iteration=it, residual=s["r"])

    final, history = run_iteration_loop(
        step, make_check_args, state, criteria, b2, r0_norm, b_norm,
        trace=trace)
    return finish(final, history, final["state"]["x"], final["state"]["r"],
                  squeeze)


Ir = SolverAPI("Ir", solve)
Richardson = Ir
