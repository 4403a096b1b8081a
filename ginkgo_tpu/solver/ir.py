"""Iterative refinement / (preconditioned) Richardson.

Analog of ``core/solver/ir.cpp`` (``include/ginkgo/core/solver/ir.hpp:81``):
``x += relaxation_factor * solver(b - A x)`` with a pluggable inner solver
(Ginkgo's ``with_solver``; identity by default = plain Richardson).  This is
the host of the mixed-precision-IR pattern: pass an inner solver generated at
lower precision (``ir-ilu-preconditioned-solver`` / ``mixed-precision-ir``
examples).
"""

from __future__ import annotations

import jax.numpy as jnp

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

    def step(s):
        d = S._apply(s["r"].astype(S.dtype)).astype(s["r"].dtype)
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
