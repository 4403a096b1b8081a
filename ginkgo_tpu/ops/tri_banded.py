"""Exact block-partitioned trisolve for banded triangular factors.

The reference solves sparse triangular systems with device-resident
syncfree/sparselib kernels (``cuda/solver/common_trs_kernels.cuh``,
``core/solver/lower_trs.cpp``) — fine-grained row scheduling that a TPU
cannot express.  For the factors this framework actually produces at
scale — ILU(0)/IC(0)/ParILUT on diagonal-structured patterns (<=64
offsets) — the TPU-native formulation is a *block-partitioned inverse*:

    partition rows into S-blocks;  for block i
        x_i = inv(L_ii) @ (b_i - sum_d  l_d ⊙ shift_d(carry))

where ``L_ii`` is the (S, S) within-block lower triangle (DENSE inverse
precomputed once at generate time — the -1 subdiagonal fills it in
anyway) and the cross-block term is a masked banded axpy over a carry
window of the last ``P = ceil(bw/S)`` blocks.  The solve is one
``lax.scan`` of n/S steps: each step is an MXU (S,S)@(S,k) matvec plus
D shifted vector MACs — no gather, no level schedule.  Per-apply HBM
traffic is dominated by the block inverses (n*S values), giving
~n*S*4/819GB/s on v5e vs num_levels full SpMV passes for the nilpotent
sweep form (13.4 ms -> sub-ms at n=262k, S=256).

Upper factors are solved as reversed lower systems (rows and columns
flipped), so one code path serves LowerTrs and UpperTrs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .registry import register

# block inverses cost n*S*itemsize bytes of HBM; refuse plans beyond this
_MAX_INV_BYTES = 1 << 30
_MAX_OFFSETS = 64


def _pick_block(n: int, bw: int) -> int:
    """Block size: 256 amortizes scan-step overhead at large n; small
    problems take one or two blocks."""
    S = 256
    while S >= 2 * max(n, 1) and S > 8:
        S //= 2
    return max(S, 8)


def _want_device_inverse(dtype) -> bool:
    """Route the block-inverse build to the accelerator: scatter the
    compact (D, n) diagonal planes into the (nb, S, S) slab ON DEVICE
    and invert on the MXU (``ops/tri_inv.py``).  This ships ~D*n values
    instead of the n*S host-built inverse (~10x less through a slow
    host link at D«S) and replaces the 3.1 s (n=262k f32) host trtri
    loop.  f32 only (the doubling inverse runs at f32; f64/complex
    keep the wide-precision host LAPACK build), accelerator only (on
    CPU, LAPACK beats the einsum doubling)."""
    import jax
    from jax import dtypes as _dtypes
    return (jax.default_backend() != "cpu"
            and _dtypes.canonicalize_dtype(dtype) == jnp.float32)


@functools.partial(jax.jit, static_argnames=("offsets", "nb", "S"))
def _scatter_invert(dvb, offsets, nb, S):
    from .tri_inv import batched_lowtri_inverse
    t = np.arange(S)
    Lb = jnp.zeros((nb, S, S), jnp.float32)
    for di, off in enumerate(offsets):
        off = int(off)
        if off <= -S:
            continue            # always cross-block
        rows = t[t >= -off]
        Lb = Lb.at[:, rows, rows + off].set(dvb[di][:, rows])
    return batched_lowtri_inverse(Lb)


def _build_inverse_device(dvb, offsets, nb, S):
    """dvb: (D, nb, S) f32 per-offset block value planes (diag plane
    guaranteed nonzero by the caller); returns (nb, S, S) inverses."""
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()      # persist the build executable
    return _scatter_invert(jnp.asarray(dvb, jnp.float32), tuple(
        int(o) for o in offsets), int(nb), int(S))


def plan_block_trisolve(data, lower: bool, unit_diagonal: bool,
                        S: int | None = None, unroll: int | None = None,
                        max_bytes: int = _MAX_INV_BYTES,
                        device_build: bool | None = None):
    """Build the block plan from triangular MatrixData, or None when the
    factor is not banded-triangular (too many offsets / wrong side /
    inverse storage over budget).  Host-side, build-time (numpy)."""
    n, m = data.shape
    if n != m or n == 0 or data.nnz == 0:
        return None
    r = data.row_idx.astype(np.int64)
    c = data.col_idx.astype(np.int64)
    v = data.values
    if not lower:               # reversed-order rows turn U into an L
        r, c = (n - 1) - r, (n - 1) - c
    d_of = c - r
    if (d_of > 0).any():        # not triangular on the expected side
        return None
    offsets = np.unique(d_of)
    if offsets.size > _MAX_OFFSETS:
        return None
    bw = int(-offsets.min()) if offsets.size else 0
    if S is None:
        S = _pick_block(n, bw)
    if n * S * v.dtype.itemsize > max_bytes:
        return None
    nb = -(-n // S)
    P = max(1, -(-bw // S))

    # (D, nb*S) per-row diagonal values (padded rows empty)
    D = offsets.size
    dv = np.zeros((D, nb * S), v.dtype)
    d_idx = np.searchsorted(offsets, d_of)
    dv[d_idx, r] = v
    if unit_diagonal:
        z = np.searchsorted(offsets, 0)
        if z < D and offsets[z] == 0:
            dv[z, :n] = 1
        else:
            offsets = np.append(offsets, 0)
            dv = np.concatenate([dv, np.zeros((1, nb * S), v.dtype)])
            dv[-1, :n] = 1
            D += 1
    # guard: structurally-missing / zero diagonals solve as 1 (matches
    # _TrsFactory's diag handling)
    z = np.searchsorted(offsets, 0)
    has_diag = z < D and offsets[z] == 0
    if not has_diag:
        offsets = np.append(offsets, 0)
        dv = np.concatenate([dv, np.zeros((1, nb * S), v.dtype)])
        z = D
        D += 1
    diag_plane = dv[z]
    diag_plane[:n][diag_plane[:n] == 0] = 1
    diag_plane[n:] = 1          # padding rows: identity

    dvb = dv.reshape(D, nb, S)
    # cross-block value planes (diag plane excluded — never cross)
    keep = [di for di, off in enumerate(offsets) if int(off) != 0]
    ov = np.ascontiguousarray(dvb[keep].transpose(1, 0, 2))  # (nb, Dc, S)
    cross_offsets = tuple(int(offsets[di]) for di in keep)
    if unroll is None:
        # v5e sweep at n=262k (27-pt IC(0) factor): S=256/U=8 is the
        # plateau minimum (0.97 ms; U=4 1.09, U=16 2.3, S=64 3.2 —
        # per-sub-block issue cost ~0.6 us dominates below S=128)
        unroll = 8 if nb >= 128 else (4 if nb >= 16 else 1)
    meta = dict(n=n, S=S, P=P, nb=nb, offsets=cross_offsets,
                flip=not lower, unroll=int(unroll))

    # device-resident build (accelerator + f32): scatter the compact
    # (D, n) planes into the slab ON DEVICE and invert on the MXU
    # (ops/tri_inv.py) — ships ~D*n values instead of the n*S
    # host-built inverse (~10x less at D«S) and replaces the 3.1 s
    # host trtri loop (n=262k f32).  This is NOT the rejected variant
    # below: that one shipped the HOST-built dense slab (~20 s through
    # this environment's tunnel).  Non-finite inverses (ill-scaled
    # triangles) fall through to the wide-precision host build, which
    # has the per-block singular fallback and the final reject.
    want_dev = (device_build if device_build is not None
                else _want_device_inverse(v.dtype))
    if want_dev:
        inv_d = _build_inverse_device(dvb, offsets, nb, S)
        if bool(jnp.isfinite(inv_d).all()):
            return dict(inv=inv_d, ov=ov), meta

    # dense within-block lower triangles -> batched inverse (one-time).
    # Build directly at wide precision and invert via LAPACK ?trtri
    # (triangular inverse: ~3x fewer flops than the LU route of
    # np.linalg.inv, and no 500 MB astype round-trips).
    wide = (np.complex128 if np.issubdtype(v.dtype, np.complexfloating)
            else np.float64)
    t = np.arange(S)
    Lb = np.zeros((nb, S, S), wide)
    for di, off in enumerate(offsets):
        off = int(off)
        if off <= -S:
            continue            # always cross-block
        rows = t[t >= -off]
        Lb[:, rows, rows + off] = dvb[di][:, rows]
    # Host LAPACK loop: 3.1 s at n=262k f32 / 7.1 s f64.  An MXU
    # doubling inverse of a HOST-BUILT slab was measured AND REJECTED
    # (shipping the dense (nb, S, S) blocks costs ~20 s through this
    # environment's tunnel); the device-scattered build above avoids
    # exactly that transfer, like the packed trisolve's slab.
    from scipy.linalg import get_lapack_funcs
    (trtri,) = get_lapack_funcs(("trtri",), (Lb[0],))
    inv = np.empty((nb, S, S), v.dtype)
    with np.errstate(over="ignore", invalid="ignore"):
        for i in range(nb):
            blk, info = trtri(Lb[i], lower=1)
            if info != 0:       # singular block: fall back to LU inverse
                blk = np.linalg.inv(Lb[i])
            inv[i] = blk.astype(v.dtype)
    if not np.isfinite(inv).all():
        # an ill-scaled triangle (e.g. a diverged fixed-point factor)
        # whose block inverse exceeds the value-type range: reject so
        # algorithm='auto' falls back to the inverse-free level solve
        # instead of applying inf/nan
        return None
    return dict(inv=inv, ov=ov), meta


@register("banded_trisolve", "reference")
def block_trisolve_apply(inv, ov, meta_items, b):
    """x = T^{-1} b via the block scan.  ``b``: (n, k)."""
    meta = dict(meta_items)
    n, S, P, nb = meta["n"], meta["S"], meta["P"], meta["nb"]
    offsets = meta["offsets"]
    k = b.shape[1]
    if meta["flip"]:
        b = b[::-1]
    # unroll U blocks per scan step: each step on chip costs ~1 us of
    # while-iteration overhead regardless of work (measured v5e), so at
    # nb=1024 the un-unrolled scan is overhead-bound (0.9 of 1.25 ms)
    U = int(meta.get("unroll", 1)) or 1
    nbp = -(-nb // U) * U
    if nbp != nb:               # pad with identity blocks (solve to zero)
        eye = jnp.broadcast_to(jnp.eye(S, dtype=inv.dtype),
                               (nbp - nb, S, S))
        inv = jnp.concatenate([inv, eye])
        ov = jnp.concatenate(
            [ov, jnp.zeros((nbp - nb,) + ov.shape[1:], ov.dtype)])
    bp = jnp.pad(b, ((0, nbp * S - n), (0, 0))).reshape(nbp, S, k)
    mask = {off: (jnp.arange(S) < -off)[:, None] for off in offsets}
    PS = P * S

    def sub_block(carry, inv_i, ov_i, b_i):
        ext = jnp.concatenate([carry, jnp.zeros((S, k), carry.dtype)])
        contrib = jnp.zeros((S, k), b_i.dtype)
        for di, off in enumerate(offsets):
            seg = jax.lax.slice_in_dim(ext, PS + off, PS + off + S)
            contrib = contrib + jnp.where(
                mask[off], ov_i[di][:, None].astype(b_i.dtype) * seg, 0)
        x_i = jnp.einsum("st,tk->sk", inv_i.astype(b_i.dtype),
                         b_i - contrib,
                         preferred_element_type=b_i.dtype)
        new_carry = (x_i if P == 1 else
                     jnp.concatenate([carry[S:], x_i]))
        return new_carry, x_i

    def step(carry, xs):
        inv_u, ov_u, b_u = xs
        outs = []
        for u in range(U):
            carry, x_u = sub_block(carry, inv_u[u], ov_u[u], b_u[u])
            outs.append(x_u)
        return carry, jnp.stack(outs)

    carry0 = jnp.zeros((PS, k), b.dtype)
    _, xs = jax.lax.scan(step, carry0,
                         (inv.reshape(nbp // U, U, S, S),
                          ov.reshape((nbp // U, U) + ov.shape[1:]),
                          bp.reshape(nbp // U, U, S, k)))
    x = xs.reshape(nbp * S, k)[:n]
    return x[::-1] if meta["flip"] else x
