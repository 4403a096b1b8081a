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
        gvals = -jnp.sum(lam2[r] * jnp.conj(x2[c]), axis=1)
        # zero out padded entries
        gvals = jnp.where(A.row_idx < A.shape[0], gvals, 0)
        gvals = gvals.astype(A.values.dtype)
        out = dataclasses.replace(zeros, values=gvals)
        if isinstance(A, Csr) and A.diag_values is not None:
            # banded layout carries a second value buffer; rebuild its grad
            # through the same (diag, row) indexing used at construction
            from .ops.spmv_pallas import block_diag_values, \
                unblock_diag_values
            meta = dict(A.band_meta)
            offs = jnp.asarray(A.diag_offsets)
            d_of = jnp.searchsorted(offs, c.astype(jnp.int64)
                                    - r.astype(jnp.int64))
            flat = jnp.zeros((len(A.diag_offsets), A.shape[0]),
                             gvals.dtype).at[d_of, r].add(gvals)
            n = meta["n"]
            NSp, S, G = meta["NSp"], meta["S"], meta["G"]
            padded = jnp.zeros((flat.shape[0], NSp * 128), flat.dtype
                               ).at[:, :n].set(flat)
            dvb = jnp.transpose(
                padded.reshape(flat.shape[0], G, S, 128), (1, 0, 2, 3))
            out = dataclasses.replace(out, diag_values=dvb)
        return out
    if isinstance(A, Dense):
        return dataclasses.replace(
            zeros, data=(-lam2 @ jnp.conj(x2).T).astype(A.data.dtype))
    raise NotImplementedError(
        f"implicit gradients not implemented for {type(A).__name__}")
