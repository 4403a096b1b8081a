"""Restarted GMRES (right-preconditioned) + the CB-GMRES compressed basis.

Analog of ``core/solver/gmres.cpp`` (719 LoC: ``orthogonalize_mgs:156``,
Givens ``hessenberg_qr``, ``multi_axpy``) and ``core/solver/cb_gmres.cpp``
(compressed Krylov basis via storage accessors,
``core/solver/cb_gmres_accessor.hpp:56-115``).

TPU-first design decisions:

* The Krylov basis lives as one static ``(m+1, n, k)`` array; classical
  Gram-Schmidt with one re-orthogonalisation (CGS2) is the default ortho
  method — two big MXU matmuls per iteration instead of Ginkgo's default
  sequential MGS (which is also available, Ginkgo's ``ortho_method`` knob).
* Givens rotations / Hessenberg QR run on (k,)-vector scalars inside the
  same jitted while_loop; the per-column residual estimate ``|g[j+1]|``
  feeds the stopping criterion for free.
* Restart is a branch inside the loop body (``lax.cond``), so the whole
  solve — inner steps, restarts, convergence — is ONE compiled program.
* CB-GMRES's accessor (``reduced_row_major`` / scaled integer storage)
  becomes a quantise/dequantise pair around the basis buffer: storage in
  bf16/f16 or scaled int8, arithmetic in the value type.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..base.dtypes import is_complex
from ..matrix.dense import compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (SolverAPI, finish, prepare_rhs, resolve_precond,
                     run_iteration_loop, run_restarted_loop, safe_div)


# Basis storage accessors live in krylov_basis.py (shared with GCR);
# underscore aliases kept for compatibility.
from .krylov_basis import (KrylovBasis as _Basis,            # noqa: F401
                           ReducedBasis as _ReducedBasis,    # noqa: F401
                           ScaledIntBasis as _ScaledIntBasis,  # noqa: F401
                           make_basis as _make_basis)


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------

def solve(A, b, x0=None, *, criteria=None, preconditioner=None,
          krylov_dim: int = 100, ortho: str = "cgs2",
          storage_precision=None, trace: bool = False):
    """Solve A x = b with restarted right-preconditioned GMRES(m).

    ``storage_precision``: None/'keep' | 'reduce1' | 'reduce2' |
    'integer' | a dtype — the CB-GMRES compressed-basis knob
    (``include/ginkgo/core/solver/cb_gmres.hpp:61``).
    """
    b2, x, squeeze = prepare_rhs(A, b, x0)
    M = resolve_precond(preconditioner, A)
    if criteria is None:
        criteria = default_criterion(b2.dtype)
    n, k = b2.shape
    m = int(krylov_dim)
    if m < 1:
        raise ValueError(f"krylov_dim must be >= 1, got {krylov_dim}")
    dtype = b2.dtype
    # Ortho processes the basis in blocks of OB columns inside a fori_loop
    # whose trip count follows j, so per-iteration HBM traffic scales with
    # the number of vectors actually in the subspace, not with krylov_dim
    # (measured 7-10x on TPU for m=30; see BENCHMARKS.md).
    OB = min(8, m + 1)
    basis = _make_basis(storage_precision, m + 1, n, k, dtype, block=OB)

    b_norm = compute_norm2(b2)

    eye_R = jnp.broadcast_to(jnp.eye(m + 1, m, dtype=dtype)[..., None],
                             (m + 1, m, k))

    def restart_fields(x, V_store):
        """(Re)initialize the cycle, writing v0 into the EXISTING basis
        buffer: allocating a fresh one in the restart branch would make the
        two cond branches carry different buffers (copies + layout merges).
        Stale columns above j are never read — ortho is j-bounded and
        solution_update's y is masked to j_inner."""
        r = b2 - A._apply(x)
        beta = compute_norm2(r).astype(dtype)
        v0 = r * safe_div(jnp.ones_like(beta), beta)[None, :]
        V = basis.write(V_store, 0, v0)
        g = jnp.zeros((m + 1, k), dtype).at[0].set(beta)
        return dict(x=x, V=V, R=eye_R, g=g,
                    cs=jnp.zeros((m, k), dtype), sn=jnp.zeros((m, k), dtype),
                    j_inner=jnp.zeros((k,), jnp.int32),
                    resnorm_est=jnp.abs(beta), j=jnp.zeros((), jnp.int32))

    state0 = restart_fields(x, basis.empty())
    r0_norm = state0["resnorm_est"]

    m_pad = basis.shape[0]

    def project(V_store, w, j):
        """One orthogonalisation pass of w against span(V[0..j]), processed
        in OB-column blocks inside a fori_loop whose trip count is
        ceil((j+1)/OB) — HBM traffic follows j, not krylov_dim.  Within a
        block the projection is classical (one batched dot + one batched
        update); across blocks it is modified Gram-Schmidt, which is at
        least as stable as plain CGS."""
        nblocks = (j + 1 + OB - 1) // OB        # traced upper bound

        def body(i, carry):
            # V_store travels in the carry (unchanged) rather than as a
            # closure constant: a captured operand stays live across the
            # whole inner loop and blocks XLA from aliasing the basis
            # buffer into the subsequent dynamic-update-slice write
            h_acc, w, V = carry
            start = i * OB
            blk = basis.read_block(V, start, OB, dtype)         # (OB, n, k)
            col = start + jnp.arange(OB)
            mask = (col <= j)[:, None].astype(w.real.dtype)
            hb = jnp.einsum("inr,nr->ir", jnp.conj(blk), w,
                            preferred_element_type=w.dtype) * mask
            w = w - jnp.einsum("ir,inr->nr", hb, blk,
                               preferred_element_type=w.dtype)
            h_acc = jax.lax.dynamic_update_slice_in_dim(h_acc, hb, start, 0)
            return h_acc, w, V

        h0 = jnp.zeros((m_pad, k), dtype)
        h, w, _ = jax.lax.fori_loop(0, nblocks, body, (h0, w, V_store))
        return h[:m + 1], w

    def orthogonalize(V_store, w, j):
        if ortho == "mgs":
            def body(i, carry):
                h, w = carry
                vi = basis.read_one(V_store, i, dtype)
                hi = jnp.sum(jnp.conj(vi) * w, axis=0)
                return h.at[i].set(hi), w - hi[None, :] * vi

            h0 = jnp.zeros((m + 1, k), dtype)
            return jax.lax.fori_loop(0, j + 1, body, (h0, w))
        h, w = project(V_store, w, j)
        if ortho == "cgs2":
            h2, w = project(V_store, w, j)
            h = h + h2
        elif ortho != "cgs":
            raise ValueError(f"unknown ortho method {ortho!r}")
        return h, w

    def arnoldi_step(s):
        j = s["j"]
        vj = basis.read_one(s["V"], j, dtype)
        w = A._apply(M._apply(vj))
        hcol, w = orthogonalize(s["V"], w, j)
        h_new = compute_norm2(w).astype(dtype)
        v_next = w * safe_div(jnp.ones_like(h_new), h_new)[None, :]
        V = basis.write(s["V"], j + 1, v_next)

        # apply previous rotations 0..j-1 to the new column.  The textbook
        # loop (hc[i], hc[i+1] updated by rotation i in sequence) is a
        # length-m chain of tiny scalar ops — measured ~8 us PER STEP on
        # TPU (240 us/iter at m=30, dominating the whole arnoldi step).
        # The recurrence is affine in the running carry
        #     t_0 = hc[0],  t_{i+1} = -sn_i * t_i + cs_i * hc[i+1]
        #     hc_new[i] = conj(cs_i) * t_i + sn_i * hc[i+1]   (i < j)
        #     hc_new[j] = t_j
        # so it vectorizes as one associative_scan over affine maps —
        # log-depth vector ops instead of m serialized scalar ops.  The
        # surrounding traced-index .at[j].set updates fold into the same
        # masked vector expressions (each would be its own serialized op).
        idx = jnp.arange(m)[:, None]
        act = idx < j
        c_eff = jnp.where(act, s["cs"], jnp.ones_like(s["cs"]))
        s_eff = jnp.where(act, s["sn"], jnp.zeros_like(s["sn"]))
        # hcol[j+1] = h_new folded into the rotation inputs (entries of
        # hcol beyond j+1 are exactly zero: ortho masks blocks to <= j)
        b_next = jnp.where(idx == j, h_new[None, :], hcol[1:m + 1])
        alpha = -s_eff
        beta = c_eff * b_next

        def affine(p, q):
            a1, b1 = p
            a2, b2 = q
            return a2 * a1, a2 * b1 + b2

        acc_a, acc_b = jax.lax.associative_scan(affine, (alpha, beta),
                                                axis=0)
        t = jnp.concatenate(
            [hcol[0:1], acc_a * hcol[0:1] + acc_b], axis=0)    # (m+1, k)
        rotated = jnp.conj(c_eff) * t[:m] + s_eff * b_next

        # new rotation annihilating position j+1 (hj = t_j, hj1 = h_new)
        hj = jax.lax.dynamic_index_in_dim(t, j, 0, keepdims=False)
        hj1 = h_new
        denom = jnp.sqrt(jnp.abs(hj) ** 2 + jnp.abs(hj1) ** 2).astype(dtype)
        c = jnp.where(denom == 0, jnp.ones_like(hj), safe_div(hj, denom))
        sg = safe_div(hj1, denom)
        # final R column: rotated below j, denom at j, zero above
        rcol = jnp.where(act, rotated, jnp.where(idx == j,
                                                 denom[None, :],
                                                 jnp.zeros_like(rotated)))
        rcol = jnp.concatenate(
            [rcol, jnp.zeros((1, k), dtype)], axis=0)          # (m+1, k)
        gj = jax.lax.dynamic_index_in_dim(s["g"], j, 0, keepdims=False)
        idx1 = jnp.arange(m + 1)[:, None]
        g = jnp.where(idx1 == j, (jnp.conj(c) * gj)[None, :],
                      jnp.where(idx1 == j + 1, (-sg * gj)[None, :],
                                s["g"]))
        zero = jnp.zeros((), j.dtype)
        R = jax.lax.dynamic_update_slice(s["R"], rcol[:, None, :],
                                         (zero, j, zero))
        cs = jnp.where(idx == j, c[None, :], s["cs"])
        sn = jnp.where(idx == j, sg[None, :], s["sn"])
        return dict(x=s["x"], V=V, R=R, g=g,
                    cs=cs, sn=sn,
                    j_inner=s["j_inner"] + 1,
                    resnorm_est=jnp.abs(sg * gj), j=j + 1)

    def solution_update(s):
        """x += M (V[:m] y),  R y = g masked to each column's j_inner."""
        col = jnp.arange(m)
        g_eff = jnp.where(col[:, None] < s["j_inner"][None, :], s["g"][:m],
                          jnp.zeros_like(s["g"][:m]))
        y = jax.vmap(
            lambda Rk, gk: jax.scipy.linalg.solve_triangular(
                Rk, gk, lower=False),
            in_axes=(2, 1), out_axes=1)(s["R"][:m], g_eff)   # (m, k)
        V_all = basis.read_all(s["V"], dtype)[:m]
        u = jnp.einsum("jnr,jr->nr", V_all, y, preferred_element_type=dtype)
        return s["x"] + M._apply(u)

    def restart(s):
        return restart_fields(solution_update(s), s["V"])

    def make_check_args(s, it):
        return CheckArgs(iteration=it, residual_norm=s["resnorm_est"])

    from ..stop.criterion import as_criterion, has_host_side
    if trace or has_host_side(as_criterion(criteria)):
        # history / wall-clock paths: single-level loop with the restart
        # as a per-iteration cond (slower but supports scan/host driving).
        # The restart folds into the same trip as the following arnoldi
        # step so iteration counts match the hot two-level path (restarts
        # are free, as in the reference's counting).
        def step(s):
            s = jax.lax.cond(s["j"] >= m, restart, lambda s: s, s)
            return arnoldi_step(s)

        final, history = run_iteration_loop(
            step, make_check_args, state0, criteria, b2, r0_norm, b_norm,
            trace=trace)
        xf = solution_update(final["state"])
        rf = b2 - A._apply(xf)
        # post-hoc honesty check (the hot run_restarted_loop path audits
        # inside the loop): the estimate-based `converged` only stands if
        # the criterion also accepts the TRUE final residual; otherwise the
        # column is reported stagnated, matching the reference's separate
        # recurrent/true residual bookkeeping
        # (benchmark/solver/solver_common.hpp:560,634).
        crit = as_criterion(criteria)
        args = CheckArgs(iteration=final["it"],
                         residual_norm=compute_norm2(rf))
        stop_t, conv_t, _ = crit.check(final["crit"], args)
        est = final["converged"]
        final = dict(final, converged=est & conv_t,
                     stagnated=est & ~conv_t)
    else:
        # hot path: inner while runs pure arnoldi steps (no cond touching
        # the basis), restart once per cycle in the outer loop; mid-cycle
        # estimate-based stops are audited against the restart's true
        # residual before `converged` is final (see run_restarted_loop)
        final, history = run_restarted_loop(
            arnoldi_step, lambda s: s["j"] >= m, restart, make_check_args,
            state0, criteria, b2, r0_norm, b_norm)
        xf = solution_update(final["state"])
        rf = b2 - A._apply(xf)
    return finish(final, history, xf, rf, squeeze)


def solve_cb(A, b, x0=None, *, storage_precision="reduce1", **kw):
    """CB-GMRES: GMRES with a compressed Krylov basis
    (``include/ginkgo/core/solver/cb_gmres.hpp:96``)."""
    return solve(A, b, x0, storage_precision=storage_precision, **kw)


Gmres = SolverAPI("Gmres", solve)
CbGmres = SolverAPI("CbGmres", solve_cb)
