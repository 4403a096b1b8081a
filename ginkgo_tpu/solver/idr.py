"""IDR(s) — induced dimension reduction.

Analog of ``core/solver/idr.cpp`` (``include/ginkgo/core/solver/idr.hpp:56``):
the biortho IDR(s) variant with the omega angle correction (``kappa``,
default 0.7) and a deterministic random shadow space P (Ginkgo's
``deterministic`` parameter is always-on here: P is generated host-side at
trace time from a fixed seed, so solves are reproducible by construction).

The ``s`` inner steps are a statically unrolled Python loop (s is tiny, 2-4),
each one SpMV + one preconditioner apply; one driver trip = one full IDR
cycle of ``s + 1`` SpMVs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.dtypes import is_complex
from ..matrix.dense import compute_conj_dot, compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (SolverAPI, finish, prepare_rhs, resolve_precond,
                     run_iteration_loop, safe_div)


def _shadow_space(n, s, dtype, seed):
    rng = np.random.default_rng(seed)
    P = rng.standard_normal((n, s))
    if is_complex(dtype):
        P = P + 1j * rng.standard_normal((n, s))
    Q, _ = np.linalg.qr(P)
    return jnp.asarray(Q.conj().T, dtype)   # (s, n), rows orthonormal


def solve(A, b, x0=None, *, criteria=None, preconditioner=None,
          subspace_dim: int = 2, kappa: float = 0.7, seed: int = 1729,
          trace: bool = False):
    """Solve A x = b with IDR(s). Jit-compatible."""
    b2, x, squeeze = prepare_rhs(A, b, x0)
    M = resolve_precond(preconditioner, A)
    if criteria is None:
        criteria = default_criterion(b2.dtype)
    n, k = b2.shape
    s = int(subspace_dim)
    dtype = b2.dtype
    P = _shadow_space(n, s, dtype, seed)     # (s, n)

    r = b2 - A._apply(x)
    eyes = jnp.broadcast_to(jnp.eye(s, dtype=dtype)[..., None], (s, s, k))
    state = dict(x=x, r=r,
                 G=jnp.zeros((s, n, k), dtype), U=jnp.zeros((s, n, k), dtype),
                 Mm=eyes, om=jnp.ones((k,), dtype))
    b_norm = compute_norm2(b2)
    r0_norm = compute_norm2(r)

    def step(st):
        x, r, G, U, Mm, om = (st["x"], st["r"], st["G"], st["U"], st["Mm"],
                              st["om"])
        f = jnp.einsum("sn,nr->sr", jnp.conj(P), r,
                       preferred_element_type=dtype)   # (s, k)
        for kk in range(s):
            # c = Mm[kk:, kk:]^-1 f[kk:] by forward substitution (unrolled)
            c = []
            for i in range(kk, s):
                acc = f[i]
                for li, l in enumerate(range(kk, i)):
                    acc = acc - Mm[i, l] * c[li]
                c.append(safe_div(acc, Mm[i, i]))
            v = r
            for li, l in enumerate(range(kk, s)):
                v = v - c[li][None, :] * G[l]
            v = M._apply(v)
            u_k = om[None, :] * v
            for li, l in enumerate(range(kk, s)):
                u_k = u_k + c[li][None, :] * U[l]
            g_k = A._apply(u_k)
            # biorthogonalise against P[:kk]
            for i in range(kk):
                alpha = safe_div(
                    jnp.einsum("n,nr->r", jnp.conj(P[i]), g_k), Mm[i, i])
                g_k = g_k - alpha[None, :] * G[i]
                u_k = u_k - alpha[None, :] * U[i]
            G = G.at[kk].set(g_k)
            U = U.at[kk].set(u_k)
            mcol = jnp.einsum("sn,nr->sr", jnp.conj(P[kk:]), g_k,
                              preferred_element_type=dtype)  # (s-kk, k)
            Mm = Mm.at[kk:, kk].set(mcol)
            beta = safe_div(f[kk], Mm[kk, kk])
            r = r - beta[None, :] * g_k
            x = x + beta[None, :] * u_k
            if kk + 1 < s:
                f = f.at[kk + 1:].add(-beta[None, :] * Mm[kk + 1:, kk])
        # enter the next Sonneveld space
        v = M._apply(r)
        t = A._apply(v)
        tr = compute_conj_dot(t, r)
        tt = jnp.real(compute_conj_dot(t, t))
        om = safe_div(tr, tt.astype(tr.dtype))
        # angle correction (maintain-convergence strategy)
        nr = compute_norm2(r)
        rho = safe_div(jnp.abs(tr), jnp.sqrt(tt) * nr)
        om = jnp.where(rho < kappa,
                       om * safe_div(jnp.full_like(rho, kappa), rho), om)
        x = x + om[None, :] * v
        r = r - om[None, :] * t
        return dict(x=x, r=r, G=G, U=U, Mm=Mm, om=om)

    def make_check_args(st, it):
        return CheckArgs(iteration=it, residual=st["r"])

    final, history = run_iteration_loop(
        step, make_check_args, state, criteria, b2, r0_norm, b_norm,
        trace=trace)
    return finish(final, history, final["state"]["x"], final["state"]["r"],
                  squeeze)


Idr = SolverAPI("Idr", solve)
