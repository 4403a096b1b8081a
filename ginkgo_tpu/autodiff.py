"""Implicit differentiation of linear solves.

Beyond-parity, TPU/JAX-native capability (no reference analog — Ginkgo has
no autodiff): make ``x = A^{-1} b`` differentiable under ``jax.grad`` even
though the Krylov ``while_loop`` is not reverse-differentiable, via the
implicit function theorem:

    dL/db      =  A^{-H} g            (one adjoint solve)
    dL/dA_ij   = -(A^{-H} g)_i x_j    (restricted to A's sparsity pattern)

Supports Csr/Coo/Dense system matrices; the adjoint solve reuses the same
solver (on A^H).  This enables PDE-constrained optimisation / end-to-end
training through solver layers on TPU.

Note: differentiating w.r.t. the whole operator pytree requires
``jax.grad(..., allow_int=True)`` (index arrays are integer leaves and
receive zero cotangents); differentiating w.r.t. just the value buffer
(close over the operator, map values in) needs no flag.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .matrix.coo import Coo
from .matrix.csr import Csr
from .matrix.dense import Dense


def _conj_transpose(A):
    return A.conj_transpose() if hasattr(A, "conj_transpose") else A


def make_differentiable_solve(solve_fn, **solve_kwargs):
    """Wrap a ``solve(A, b, ...)`` function into a jax.grad-compatible
    ``f(A, b) -> x`` using implicit differentiation.

    Gradients flow to ``b`` and to ``A``'s value arrays (pattern fixed).
    """

    @jax.custom_vjp
    def solve(A, b):
        return solve_fn(A, b, **solve_kwargs).x

    def fwd(A, b):
        x = solve(A, b)
        return x, (A, x)

    def bwd(res, g):
        A, x = res
        At = _conj_transpose(A)
        lam = solve_fn(At, jnp.conj(g) if jnp.iscomplexobj(g) else g,
                       **solve_kwargs).x
        lam = jnp.conj(lam) if jnp.iscomplexobj(g) else lam
        grad_b = lam
        grad_A = _grad_wrt_operator(A, lam, x)
        return grad_A, grad_b

    solve.defvjp(fwd, bwd)
    return solve


def _grad_wrt_operator(A, lam, x):
    """dL/dA = -lam x^H restricted to A's stored entries; returns a pytree
    matching A with gradients in the value leaves and zeros elsewhere."""
    lam2 = lam[:, None] if lam.ndim == 1 else lam
    x2 = x[:, None] if x.ndim == 1 else x
    zeros = jax.tree_util.tree_map(jnp.zeros_like, A)
    if isinstance(A, (Csr, Coo)):
        r = jnp.clip(A.row_idx, 0, A.shape[0] - 1)
        c = jnp.clip(A.col_idx, 0, A.shape[1] - 1)
        # JAX cotangent convention: dL/dA = -lam x^T (no conjugation of x;
        # verified against jnp.linalg.solve gradients for complex types)
        gvals = -jnp.sum(lam2[r] * x2[c], axis=1)
        # zero out padded entries
        gvals = jnp.where(A.row_idx < A.shape[0], gvals, 0)
        gvals = gvals.astype(A.values.dtype)
        out = dataclasses.replace(zeros, values=gvals)
        if isinstance(A, Csr) and A.diag_values is not None:
            # the banded forward never reads the COO `values` buffer — its
            # true gradient is zero; everything flows to diag/tail buffers
            out = dataclasses.replace(out, values=jnp.zeros_like(A.values))
            # banded layout carries a second value buffer; rebuild its grad
            # through the same (diag, row) indexing used at construction.
            # Off-band (COO-tail) entries must NOT be scattered here — their
            # gradient goes to tail_vals, in the same canonical entry order
            # the tail was built with.
            meta = dict(A.band_meta)
            offs = jnp.asarray(A.diag_offsets)
            delta = c.astype(offs.dtype) - r.astype(offs.dtype)
            d_of = jnp.clip(jnp.searchsorted(offs, delta), 0,
                            offs.shape[0] - 1)
            on_band = (offs[d_of] == delta) & (A.row_idx < A.shape[0])
            D = len(A.diag_offsets)
            flat = jnp.zeros((D, A.shape[0]), gvals.dtype).at[
                jnp.where(on_band, d_of, 0),
                jnp.where(on_band, r, 0)].add(
                jnp.where(on_band, gvals, 0))
            n = meta["n"]
            NSp, S, G = meta["NSp"], meta["S"], meta["G"]
            padded = jnp.zeros((flat.shape[0], NSp * 128), flat.dtype
                               ).at[:, :n].set(flat)
            dvb = jnp.transpose(
                padded.reshape(flat.shape[0], G, S, 128), (1, 0, 2, 3))
            out = dataclasses.replace(
                out, diag_values=dvb.astype(A.diag_values.dtype))
            if A.tail_rows is not None:
                # tail entries appear in canonical order both in the full
                # COO arrays and in the tail arrays: compact by prefix-sum
                valid = A.row_idx < A.shape[0]
                is_tail = (~on_band) & valid
                slot = jnp.cumsum(is_tail.astype(jnp.int32)) - 1
                tcap = A.tail_vals.shape[0]
                tg = jnp.zeros((tcap + 1,), gvals.dtype).at[
                    jnp.where(is_tail, jnp.minimum(slot, tcap), tcap)].add(
                    jnp.where(is_tail, gvals, 0))[:tcap]
                out = dataclasses.replace(
                    out, tail_vals=tg.astype(A.tail_vals.dtype))
        return out
    if isinstance(A, Dense):
        return dataclasses.replace(
            zeros, data=(-lam2 @ x2.T).astype(A.data.dtype))
    raise NotImplementedError(
        f"implicit gradients not implemented for {type(A).__name__}")
