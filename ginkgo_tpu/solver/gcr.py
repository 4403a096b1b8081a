"""GCR (generalized conjugate residual, restarted).

Analog of ``core/solver/gcr.cpp`` (``include/ginkgo/core/solver/gcr.hpp:48``).
Search directions P and their images Q = A P live in static ``(m, n, k)``
buffers; orthogonalisation of each new q against previous Q is one masked
MXU matmul pair (CGS-style), and restart is a zero-cost index wrap (GCR
updates x every step, so nothing needs reconstructing at the boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..matrix.dense import compute_conj_dot, compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (SolverAPI, finish, prepare_rhs, resolve_precond,
                     run_iteration_loop, safe_div)


def solve(A, b, x0=None, *, criteria=None, preconditioner=None,
          krylov_dim: int = 100, trace: bool = False):
    """Solve A x = b with restarted GCR(m). Jit-compatible."""
    b2, x, squeeze = prepare_rhs(A, b, x0)
    M = resolve_precond(preconditioner, A)
    if criteria is None:
        criteria = default_criterion(b2.dtype)
    n, k = b2.shape
    m = int(krylov_dim)
    dtype = b2.dtype

    r = b2 - A._apply(x)
    state = dict(x=x, r=r,
                 P=jnp.zeros((m, n, k), dtype), Q=jnp.zeros((m, n, k), dtype),
                 j=jnp.zeros((), jnp.int32))
    b_norm = compute_norm2(b2)
    r0_norm = compute_norm2(r)

    def step(s):
        jm = jnp.mod(s["j"], m)          # restart = index wrap
        p = M._apply(s["r"])
        q = A._apply(p)
        mask = (jnp.arange(m) < jm)[:, None].astype(dtype)
        beta = jnp.einsum("inr,nr->ir", jnp.conj(s["Q"]), q,
                          preferred_element_type=dtype) * mask
        q = q - jnp.einsum("ir,inr->nr", beta, s["Q"],
                           preferred_element_type=dtype)
        p = p - jnp.einsum("ir,inr->nr", beta, s["P"],
                           preferred_element_type=dtype)
        nq = compute_norm2(q).astype(dtype)
        inv = safe_div(jnp.ones_like(nq), nq)[None, :]
        q = q * inv
        p = p * inv
        alpha = compute_conj_dot(q, s["r"])[None, :]
        return dict(x=s["x"] + alpha * p, r=s["r"] - alpha * q,
                    # in-place slot write (XLA donates the while_loop carry)
                    P=jax.lax.dynamic_update_index_in_dim(s["P"], p, jm, 0),
                    Q=jax.lax.dynamic_update_index_in_dim(s["Q"], q, jm, 0),
                    j=s["j"] + 1)

    def make_check_args(s, it):
        return CheckArgs(iteration=it, residual=s["r"])

    final, history = run_iteration_loop(
        step, make_check_args, state, criteria, b2, r0_norm, b_norm,
        trace=trace)
    return finish(final, history, final["state"]["x"], final["state"]["r"],
                  squeeze)


Gcr = SolverAPI("Gcr", solve)
