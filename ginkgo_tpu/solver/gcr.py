"""GCR (generalized conjugate residual, restarted).

Analog of ``core/solver/gcr.cpp`` (``include/ginkgo/core/solver/gcr.hpp:48``).
Search directions P and their images Q = A P live in static buffers
(the shared ``KrylovBasis`` store: k=1 squeezed 2-D, padded to the ortho block);
orthogonalisation of each new q against previous Q walks the buffers in
blocks inside a fori_loop whose trip count follows the direction count, so
HBM traffic scales with the live subspace, not krylov_dim (same measured
fixes as GMRES — see BENCHMARKS.md).  Restart is a zero-cost index wrap
(GCR updates x every step, so nothing needs reconstructing at the
boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..matrix.dense import compute_conj_dot, compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (SolverAPI, finish, prepare_rhs, resolve_precond,
                     run_iteration_loop, safe_div)
from .krylov_basis import KrylovBasis


def solve(A, b, x0=None, *, criteria=None, preconditioner=None,
          krylov_dim: int = 100, trace: bool = False):
    """Solve A x = b with restarted GCR(m). Jit-compatible."""
    b2, x, squeeze = prepare_rhs(A, b, x0)
    M = resolve_precond(preconditioner, A)
    if criteria is None:
        criteria = default_criterion(b2.dtype)
    n, k = b2.shape
    m = int(krylov_dim)
    if m < 1:
        raise ValueError(f"krylov_dim must be >= 1, got {krylov_dim}")
    dtype = b2.dtype
    OB = min(8, m)
    buf = KrylovBasis(m, n, k, dtype, block=OB)

    def init_state(x):
        # also the audit restart: true r + index reset to 0 (a GCR
        # restart discards the stored directions via the j < jm mask)
        r = b2 - A._apply(x)
        return dict(x=x, r=r, P=buf.empty(), Q=buf.empty(),
                    j=jnp.zeros((), jnp.int32))

    state = init_state(x)
    b_norm = compute_norm2(b2)
    r0_norm = compute_norm2(state["r"])

    def step(s):
        jm = jnp.mod(s["j"], m)          # restart = index wrap
        p = M._apply(s["r"])
        q = A._apply(p)
        nblocks = (jm + OB - 1) // OB    # blocks covering slots < jm

        def body(i, carry):
            q, p = carry
            start = i * OB
            Qb = buf.read_block(s["Q"], start, OB, dtype)
            Pb = buf.read_block(s["P"], start, OB, dtype)
            col = start + jnp.arange(OB)
            mask = (col < jm)[:, None].astype(q.real.dtype)
            bb = jnp.einsum("inr,nr->ir", jnp.conj(Qb), q,
                            preferred_element_type=dtype) * mask
            q = q - jnp.einsum("ir,inr->nr", bb, Qb,
                               preferred_element_type=dtype)
            p = p - jnp.einsum("ir,inr->nr", bb, Pb,
                               preferred_element_type=dtype)
            return q, p

        q, p = jax.lax.fori_loop(0, nblocks, body, (q, p))
        nq = compute_norm2(q).astype(dtype)
        inv = safe_div(jnp.ones_like(nq), nq)[None, :]
        q = q * inv
        p = p * inv
        alpha = compute_conj_dot(q, s["r"])[None, :]
        return dict(x=s["x"] + alpha * p, r=s["r"] - alpha * q,
                    # in-place slot write (XLA donates the while_loop carry)
                    P=buf.write(s["P"], jm, p), Q=buf.write(s["Q"], jm, q),
                    j=s["j"] + 1)

    def make_check_args(s, it):
        return CheckArgs(iteration=it, residual=s["r"])

    final, history = run_iteration_loop(
        step, make_check_args, state, criteria, b2, r0_norm, b_norm,
        trace=trace, restart_fn=lambda s: init_state(s["x"]))
    return finish(final, history, final["state"]["x"], final["state"]["r"],
                  squeeze)


Gcr = SolverAPI("Gcr", solve)
