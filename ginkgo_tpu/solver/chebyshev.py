"""Chebyshev (semi-)iteration.

Analog of ``core/solver/chebyshev.cpp``
(``include/ginkgo/core/solver/chebyshev.hpp:62``): inner-product-free
polynomial iteration on an eigenvalue enclosure ``foci = (lower, upper)``,
the standard smoother for multigrid on well-conditioned spectra.  Per
iteration: one preconditioner apply + one SpMV, zero reductions (the
residual-norm criterion adds its own reduction only when requested).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..matrix.dense import compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (SolverAPI, finish, prepare_rhs, resolve_precond,
                     run_iteration_loop)


def solve(A, b, x0=None, *, criteria=None, preconditioner=None,
          foci=(0.9, 1.1), trace: bool = False):
    """Solve A x = b with the Chebyshev iteration. Jit-compatible."""
    b2, x, squeeze = prepare_rhs(A, b, x0)
    M = resolve_precond(preconditioner, A)
    if criteria is None:
        criteria = default_criterion(b2.dtype)
    center = jnp.asarray((foci[0] + foci[1]) / 2, b2.dtype)
    radius = jnp.asarray((foci[1] - foci[0]) / 2, b2.dtype)

    r = b2 - A._apply(x)
    state = dict(x=x, r=r, p=jnp.zeros_like(r),
                 alpha=jnp.ones((), b2.dtype), it=jnp.int32(0))
    b_norm = compute_norm2(b2)
    r0_norm = compute_norm2(r)

    def step(s):
        z = M._apply(s["r"])
        it = s["it"]
        # beta: 0 at it 0; (radius*alpha)^2/2 at it 1; (radius*alpha/2)^2 after
        half_sq = (radius * s["alpha"] / 2) ** 2
        beta = jnp.where(it == 0, jnp.zeros_like(half_sq),
                         jnp.where(it == 1, 2 * half_sq, half_sq))
        alpha = jnp.where(it == 0, 1 / center,
                          1 / (center - beta / s["alpha"]))
        p = z + beta * s["p"]
        q = A._apply(p)
        return dict(x=s["x"] + alpha * p, r=s["r"] - alpha * q, p=p,
                    alpha=alpha, it=it + 1)

    def make_check_args(s, it):
        return CheckArgs(iteration=it, residual=s["r"])

    final, history = run_iteration_loop(
        step, make_check_args, state, criteria, b2, r0_norm, b_norm,
        trace=trace)
    return finish(final, history, final["state"]["x"], final["state"]["r"],
                  squeeze)


Chebyshev = SolverAPI("Chebyshev", solve)
