"""Batched lower-triangular inverse on device (recursive doubling).

The block-partitioned trisolves (``ops/tri_banded.py``,
``ops/tri_packed.py``) need inverses of (nb, S, S) lower-triangular
diagonal blocks at generate time.  The host LAPACK ``trtri`` loop costs
seconds at n=262k (7.1 s measured round 4, single-core); here the whole
stack inverts on the MXU via Schur doubling:

    inv [[A, 0], [B, C]] = [[A^-1, 0], [-C^-1 B A^-1, C^-1]]

Level m holds the inverses of all diagonal (m, m) sub-blocks as one
(nb*S/m, m, m) stack; each doubling assembles 2m-blocks from two
batched (m, m) matmuls.  log2(S) levels, total ~S^3/3 flops per block —
the same flops as trtri, all in MXU einsums.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("unit_diagonal",))
def batched_lowtri_inverse(Lb, unit_diagonal=False):
    """Inverse of each lower-triangular block of ``Lb`` (nb, S, S);
    S must be a power of two.  Zero/missing diagonals invert as 1
    (matching the host planner's singular-diagonal guard)."""
    nb, S, S2 = Lb.shape
    assert S == S2 and S & (S - 1) == 0, Lb.shape
    dt = Lb.dtype
    diag = jnp.ones((nb, S), dt) if unit_diagonal else \
        jnp.diagonal(Lb, axis1=1, axis2=2)
    diag = jnp.where(diag == 0, jnp.ones((), dt), diag)
    # level m=1: (nb*S, 1, 1) reciprocal stack
    inv = (1.0 / diag).reshape(nb * S, 1, 1)
    Lflat = Lb.reshape(nb, S * S)
    m = 1
    while m < S:
        two = 2 * m
        k = S // two                     # 2m-blocks per row block
        # B sub-blocks: rows [m:2m), cols [0:m) of every diagonal
        # (2m, 2m) block.  Flat gather with STATIC per-level indices —
        # a strided 5-D reshape + diagonal pads the tiny trailing dims
        # to (8, 128) tiles (measured 64x HBM expansion = OOM at
        # nb=1024, S=256)
        r0 = (np.arange(k) * two)[:, None, None]
        ii = np.arange(m)[None, :, None]
        jj = np.arange(m)[None, None, :]
        idx = jnp.asarray(((r0 + m + ii) * S + (r0 + jj)).reshape(-1))
        B = Lflat[:, idx].reshape(nb * k, m, m)
        A_inv = inv[0::2]
        C_inv = inv[1::2]
        # HIGHEST: the TPU default truncates f32 dot inputs to bf16
        ll = -jnp.einsum("bij,bjk,bkl->bil", C_inv, B.astype(dt), A_inv,
                         preferred_element_type=dt,
                         precision=jax.lax.Precision.HIGHEST)
        new = jnp.zeros((nb * k, two, two), dt)
        new = new.at[:, :m, :m].set(A_inv)
        new = new.at[:, m:, m:].set(C_inv)
        new = new.at[:, m:, :m].set(ll)
        inv = new
        m = two
    return inv.reshape(nb, S, S)
