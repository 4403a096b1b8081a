"""Batched small-dense inversion/solve that compiles for EVERY dtype on TPU.

XLA's ``LuDecomposition`` custom call only implements f32/c64 on TPU, so
``jnp.linalg.solve``/``inv`` on f64 (x64 mode) fails to compile on the
chip.  The reference never hits this (its block-Jacobi inversion is a
hand-written Gauss-Jordan device kernel,
``common/cuda_hip/preconditioner/jacobi_generate_kernels.instantiate.cpp``
``invert_block``); ours is the same algorithm expressed as jnp ops —
partial-pivoted Gauss-Jordan over a static-size augmented matrix, vmapped
over the block batch, MXU/VPU-friendly and dtype-agnostic.

Zero (singular) pivots are replaced by 1 so structurally-singular blocks
degrade exactly like the scalar-Jacobi ``1/0 -> 1`` convention
(jacobi.py generate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss_jordan_inverse_single(blk):
    bs = blk.shape[-1]
    eye = jnp.eye(bs, dtype=blk.dtype)
    aug = jnp.concatenate([blk, eye], axis=-1)          # (bs, 2*bs)

    def body(k, aug):
        col = jnp.abs(aug[:, k])
        mask = jnp.arange(bs) >= k
        p = jnp.argmax(jnp.where(mask, col, -jnp.inf))
        rk, rp = aug[k], aug[p]
        aug = aug.at[k].set(rp).at[p].set(rk)           # partial pivot swap
        piv = aug[k, k]
        piv = jnp.where(piv == 0, jnp.ones_like(piv), piv)
        rowk = aug[k] / piv
        aug = aug.at[k].set(rowk)
        factors = aug[:, k].at[k].set(0)
        return aug - factors[:, None] * rowk[None, :]

    aug = jax.lax.fori_loop(0, bs, body, aug)
    return aug[:, bs:]


def _needs_fallback(dtype) -> bool:
    """True when XLA's LU custom call can't handle ``dtype`` on the
    current backend (TPU implements only f32/c64)."""
    if jax.default_backend() in ("cpu",):
        return False
    return jnp.dtype(dtype) in (jnp.dtype(jnp.float64),
                                jnp.dtype(jnp.complex128))


def batched_inverse(blocks):
    """(nb, bs, bs) -> (nb, bs, bs) inverses; TPU-safe for every dtype."""
    if _needs_fallback(blocks.dtype):
        return jax.vmap(_gauss_jordan_inverse_single)(blocks)
    bs = blocks.shape[-1]
    eye = jnp.eye(bs, dtype=blocks.dtype)
    return jax.vmap(lambda blk: jnp.linalg.solve(blk, eye))(blocks)


def batched_solve(mats, rhs):
    """Batched dense solve A_i x_i = b_i; TPU-safe for every dtype."""
    if _needs_fallback(mats.dtype):
        inv = jax.vmap(_gauss_jordan_inverse_single)(mats)
        if rhs.ndim == mats.ndim:                       # matrix RHS
            return jnp.einsum("bij,bjk->bik", inv, rhs)
        return jnp.einsum("bij,bj->bi", inv, rhs)
    return jax.vmap(jnp.linalg.solve)(mats, rhs)


def dense_solve(mat, rhs):
    """Single dense solve A x = b; TPU-safe for every dtype (f64/c128
    route through Gauss-Jordan instead of the f32/c64-only LU call)."""
    if _needs_fallback(mat.dtype):
        return _gauss_jordan_inverse_single(mat) @ rhs
    return jnp.linalg.solve(mat, rhs)
