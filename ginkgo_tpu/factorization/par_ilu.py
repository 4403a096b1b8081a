"""ParILU / ParIC — fixed-point incomplete factorization, and the exact
ILU(0)/IC(0) host reference.

Analog of ``core/factorization/par_ilu.cpp`` (Chow-Patel asynchronous sweeps,
``include/ginkgo/core/factorization/par_ilu.hpp:70``), ``par_ic.hpp:69``, and
the exact-pattern ``core/factorization/{ilu,ic}.cpp`` (sparselib ILU0 analog).

TPU-native design: the sweep update for every pattern entry (i,j)

    s_ij = a_ij - sum_{k < min(i,j)} l_ik u_kj
    l_ij = s_ij / u_jj   (i > j)        u_ij = s_ij   (i <= j)

is data-parallel over entries once the sparse dot products are *compiled
away*: at generate time (host, symbolic) we enumerate every contributing
(l_idx, u_idx, out_idx) triple, and a sweep becomes one gather-multiply +
``segment_sum`` — exactly the shape the VPU wants, with zero atomics
(Ginkgo's GPU kernels race benignly; here the Jacobi-style update is a pure
functional map, which is also a valid Chow-Patel iteration).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..base.matrix_data import MatrixData
from ..matrix.csr import Csr
from .container import Factorization


# ---------------------------------------------------------------------------
# Symbolic phase (host): ILU(0) pattern split + contribution-pair lists
# ---------------------------------------------------------------------------

def _split_pattern(data: MatrixData):
    """A's pattern -> (L strict-lower+unit-diag pattern, U upper pattern)."""
    d = data.canonical()
    n = d.shape[0]
    r, c, v = d.row_idx.astype(np.int64), d.col_idx.astype(np.int64), d.values
    lower = r > c
    upper = r <= c
    lr, lc = r[lower], c[lower]
    ur, uc = r[upper], c[upper]
    # ensure a full diagonal in U (zero-filled where A lacks it)
    have_diag = np.zeros(n, bool)
    have_diag[ur[ur == uc]] = True
    missing = np.nonzero(~have_diag)[0]
    ur = np.concatenate([ur, missing])
    uc = np.concatenate([uc, missing])
    return d, (lr, lc), (ur, uc)


def _pair_lists(lr, lc, ur, uc, n):
    """All (l_idx, u_idx) with lc[l_idx]==ur[u_idx]=k, k<min(row,col), for
    each output entry — the csr_lookup analog, done once on the host
    (C++ native path with a pure-Python fallback)."""
    from ..native import ilu_pairs_native
    native = ilu_pairs_native(n, lr, lc, ur, uc)
    if native is not None:
        return native
    import collections
    by_row_L = collections.defaultdict(list)   # row -> [(col k, l_idx)]
    for idx, (i, k) in enumerate(zip(lr, lc)):
        by_row_L[i].append((k, idx))
    by_col_U = collections.defaultdict(dict)   # col -> {row k: u_idx}
    for idx, (k, j) in enumerate(zip(ur, uc)):
        by_col_U[j][k] = idx

    def pairs_for(i, j):
        lim = min(i, j)
        ucol = by_col_U.get(j)
        if not ucol:
            return
        for (k, lidx) in by_row_L.get(i, ()):
            if k < lim:
                uidx = ucol.get(k)
                if uidx is not None:
                    yield lidx, uidx

    out_l, out_u, out_o = [], [], []
    # L entries are outputs 0..nnz_l-1; U entries nnz_l..nnz_l+nnz_u-1
    for o, (i, j) in enumerate(zip(lr, lc)):
        for lidx, uidx in pairs_for(i, j):
            out_l.append(lidx)
            out_u.append(uidx)
            out_o.append(o)
    nl = len(lr)
    for o, (i, j) in enumerate(zip(ur, uc)):
        for lidx, uidx in pairs_for(i, j):
            out_l.append(lidx)
            out_u.append(uidx)
            out_o.append(nl + o)
    return (np.asarray(out_l, np.int64), np.asarray(out_u, np.int64),
            np.asarray(out_o, np.int64))


class ParIlu:
    """Factory: ``ParIlu(iterations=5).generate(A)`` -> Factorization.

    ``iterations``: number of fixed-point sweeps (par_ilu.hpp ``iterations``);
    the sweeps run as ONE jitted scan on device.
    """

    def __init__(self, iterations: int = 5, skip_sorting: bool = False):
        self.iterations = iterations

    def generate(self, A) -> Factorization:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d, (lr, lc), (ur, uc) = _split_pattern(data)
        n = d.shape[0]
        pl, pu, po = _pair_lists(lr, lc, ur, uc, n)

        # initial values: a_ij on pattern (0 where U diag was filled);
        # canonical order means akey is a sorted unique map
        akey = d.row_idx.astype(np.int64) * n + d.col_idx
        from .par_ilut import _sorted_lookup
        lv = _sorted_lookup(akey, d.values,
                            lr * n + lc).astype(d.values.dtype)
        uv = _sorted_lookup(akey, d.values,
                            ur * n + uc).astype(d.values.dtype)
        # diag positions in U for the division
        udiag_pos = np.full(n, -1, np.int64)
        on_diag = ur == uc
        udiag_pos[ur[on_diag]] = np.flatnonzero(on_diag)

        # Chow-Patel scaled initial guess: l_ij = a_ij / a_jj.  The
        # reference seeds raw a_ij (factorization_kernels.cpp
        # initialize_l_u) but its sweeps update in place — a nonlinear
        # Gauss-Seidel whose fresh values damp the transient.  This
        # sweep is the pure-Jacobi functional form; seeded with raw
        # values it DIVERGES on the 27-pt Poisson M-matrix (measured
        # max|l| 8.1 after 5 sweeps, 410 after 15), while the paper's
        # scaled init (Chow & Patel 2015, scaled-A iteration) settles by
        # sweep 2 and stays bounded.
        # _split_pattern guarantees every row has a U diagonal; a -1
        # sentinel surviving here would silently read uv[-1] as the
        # scaling denominator, so fail loudly instead.
        assert (udiag_pos >= 0).all(), "row(s) missing U diagonal"
        udiag = uv[udiag_pos]
        denom = np.where(udiag == 0, np.ones_like(udiag), udiag)
        lv_init = (lv / denom[lc]).astype(d.values.dtype)

        lv, uv = _run_sweeps(
            jnp.asarray(lv_init), jnp.asarray(uv),
            jnp.asarray(lv),  # a-values on L pattern
            jnp.asarray(uv),  # a-values on U pattern
            jnp.asarray(pl), jnp.asarray(pu), jnp.asarray(po),
            jnp.asarray(lc), jnp.asarray(udiag_pos), self.iterations)

        return _build_factors(n, lr, lc, np.asarray(lv), ur, uc,
                              np.asarray(uv), d.values.dtype)



@partial(jax.jit, static_argnames=("iterations",))
def _sweeps_kernel(lv, uv, la, ua, pl, pu, po, lcols, udiag_pos,
                   iterations):
    """Module-level jitted sweep: all data passed as arguments so the
    compile cache is shared across calls/iterations (a local closure
    would bake the arrays in as constants and recompile every call)."""
    nl = la.shape[0]
    nout = nl + ua.shape[0]

    def body(_, carry):
        lv, uv = carry
        contrib = jax.ops.segment_sum(lv[pl] * uv[pu], po,
                                      num_segments=nout)
        s_l = la - contrib[:nl]
        s_u = ua - contrib[nl:]
        udiag = uv[udiag_pos]
        udiag = jnp.where(udiag == 0, jnp.ones_like(udiag), udiag)
        new_l = s_l / udiag[lcols]
        return new_l, s_u

    return jax.lax.fori_loop(0, iterations, body, (lv, uv))


def _run_sweeps(lv, uv, la, ua, pl, pu, po, lcols, udiag_pos, iterations):
    return _sweeps_kernel(lv, uv, la, ua, pl, pu, po, lcols, udiag_pos,
                          int(iterations))


def _build_factors(n, lr, lc, lv, ur, uc, uv, dtype):
    # L gets a unit diagonal appended
    diag = np.arange(n)
    l_data = MatrixData((n, n),
                        np.concatenate([lr, diag]),
                        np.concatenate([lc, diag]),
                        np.concatenate([lv, np.ones(n, dtype)]))
    u_data = MatrixData((n, n), ur, uc, uv)
    L = Csr.from_data(l_data, strategy="classical")
    U = Csr.from_data(u_data, strategy="classical")
    return Factorization(l_factor=L, u_factor=U)


@partial(jax.jit, static_argnames=("iterations",))
def _ic_sweeps_kernel(la, lv0, p1, p2, po, dpos, isd, lr, lc, iterations):
    def body(_, lv):
        contrib = jax.ops.segment_sum(lv[p1] * jnp.conj(lv[p2]), po,
                                      num_segments=la.shape[0])
        s = la - contrib
        diag_new = jnp.sqrt(jnp.abs(s[dpos]))
        diag_new = jnp.where(diag_new == 0, jnp.ones_like(diag_new),
                             diag_new)
        return jnp.where(isd, diag_new[lr], s / diag_new[lc])

    return jax.lax.fori_loop(0, iterations, body, lv0)


class ParIc:
    """Factory: ParIC fixed-point incomplete Cholesky
    (``include/ginkgo/core/factorization/par_ic.hpp:69``).

    Sweep for lower-pattern entries (j <= i):
        s_ij = a_ij - sum_{k<j} l_ik l_jk
        l_ij = s_ij / l_jj (i > j);  l_jj = sqrt(s_jj)
    """

    def __init__(self, iterations: int = 5, both_factors: bool = True):
        self.iterations = iterations
        self.both_factors = both_factors

    def generate(self, A) -> Factorization:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d = data.canonical()
        n = d.shape[0]
        keep = d.row_idx >= d.col_idx
        lr = d.row_idx[keep].astype(np.int64)
        lc = d.col_idx[keep].astype(np.int64)
        lv0 = d.values[keep]
        # contribution pairs: for entry (i,j): (i,k) and (j,k), k<j
        import collections
        by_row = collections.defaultdict(dict)
        for idx, (i, k) in enumerate(zip(lr, lc)):
            by_row[i][k] = idx
        p1, p2, po = [], [], []
        for o, (i, j) in enumerate(zip(lr, lc)):
            rj = by_row[j]
            for k, idx_i in by_row[i].items():
                if k < j:
                    idx_j = rj.get(k)
                    if idx_j is not None:
                        p1.append(idx_i)
                        p2.append(idx_j)
                        po.append(o)
        diag_pos = np.full(n, 0, np.int64)
        for idx, (i, j) in enumerate(zip(lr, lc)):
            if i == j:
                diag_pos[i] = idx
        is_diag = lr == lc

        # scaled init (same divergence fix as ParIlu): l_jj = sqrt|a_jj|,
        # l_ij = a_ij / sqrt|a_jj| — the reference seeds raw values
        # (par_ic_kernels.cpp init_factor takes sqrt on the diagonal
        # only) but sweeps in place; the functional Jacobi sweep needs
        # the bounded Chow-Patel init.
        dj = np.sqrt(np.abs(lv0[diag_pos]))
        dj = np.where(dj == 0, np.ones_like(dj), dj)
        lv_init = np.where(is_diag, dj[lr],
                           lv0 / dj[lc]).astype(lv0.dtype)

        lv = np.asarray(_ic_sweeps_kernel(
            jnp.asarray(lv0), jnp.asarray(lv_init),
            jnp.asarray(np.asarray(p1, np.int64)),
            jnp.asarray(np.asarray(p2, np.int64)),
            jnp.asarray(np.asarray(po, np.int64)),
            jnp.asarray(diag_pos), jnp.asarray(is_diag),
            jnp.asarray(lr), jnp.asarray(lc), int(self.iterations)))
        l_data = MatrixData((n, n), lr, lc, lv)
        L = Csr.from_data(l_data, strategy="classical")
        Lt = Csr.from_data(l_data.conj_transpose().sort_row_major(),
                           strategy="classical")
        return Factorization(l_factor=L, u_factor=Lt, symmetric=True)


# ---------------------------------------------------------------------------
# Exact host reference — core/factorization/{ilu,ic}.cpp analog (oracle)
# ---------------------------------------------------------------------------

class Ilu0:
    """Exact ILU(0): IKJ elimination restricted to A's pattern.

    Primary path: native ``gt_ilu0`` (position-scatter IKJ on CSR —
    O(nnz · row) host time, millions of rows in seconds).  Fallback:
    the dict-based Python elimination (small matrices only)."""

    def generate(self, A) -> Factorization:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d = data.canonical()
        n = d.shape[0]
        from ..native import ilu0_native
        ptr = np.searchsorted(d.row_idx, np.arange(n + 1)).astype(np.int64)
        dtype = d.values.dtype
        wide = (np.complex128 if np.iscomplexobj(d.values) else np.float64)
        # MUST copy: canonical() may alias the caller's arrays (see
        # MatrixData docstring) and gt_ilu0 factorizes IN PLACE — a
        # no-copy view here would overwrite the user's operator with
        # its own LU factors.
        vals = np.array(d.values, wide, copy=True)
        if ilu0_native(n, ptr, d.col_idx.astype(np.int64), vals):
            lo = d.col_idx < d.row_idx
            return _build_factors(
                n, d.row_idx[lo], d.col_idx[lo], vals[lo].astype(dtype),
                d.row_idx[~lo], d.col_idx[~lo], vals[~lo].astype(dtype),
                dtype)
        rows = [dict() for _ in range(n)]
        for i, j, v in zip(d.row_idx, d.col_idx, d.values):
            rows[int(i)][int(j)] = v
        for i in range(n):
            ri = rows[i]
            for k in sorted(c for c in ri if c < i):
                dk = rows[k].get(k, 0)
                if dk == 0:
                    continue
                ri[k] = lik = ri[k] / dk
                for j, ukj in rows[k].items():
                    if j > k and j in ri:
                        ri[j] -= lik * ukj
        lr, lc, lv, ur, uc, uv = [], [], [], [], [], []
        for i in range(n):
            for j, v in rows[i].items():
                if j < i:
                    lr.append(i)
                    lc.append(j)
                    lv.append(v)
                else:
                    ur.append(i)
                    uc.append(j)
                    uv.append(v)
        dtype = d.values.dtype
        return _build_factors(
            n, np.asarray(lr, np.int64), np.asarray(lc, np.int64),
            np.asarray(lv, dtype), np.asarray(ur, np.int64),
            np.asarray(uc, np.int64), np.asarray(uv, dtype), dtype)


class Ic0:
    """Exact IC(0): incomplete Cholesky on A's lower pattern.

    Primary path: native ``gt_ic0`` (up-looking pattern-restricted
    Cholesky with a position-scatter array).  The Python fallback's
    column loop is O(n^2) — toy sizes only."""

    def generate(self, A) -> Factorization:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d = data.canonical()
        n = d.shape[0]
        from ..native import ic0_native
        lo_m = d.col_idx <= d.row_idx
        lr0 = d.row_idx[lo_m]
        lc0 = d.col_idx[lo_m]
        dtype = d.values.dtype
        wide = (np.complex128 if np.iscomplexobj(d.values) else np.float64)
        vals = np.ascontiguousarray(d.values[lo_m], wide)
        ptr = np.searchsorted(lr0, np.arange(n + 1)).astype(np.int64)
        if ic0_native(n, ptr, lc0.astype(np.int64), vals):
            l_data = MatrixData((n, n), lr0, lc0, vals.astype(dtype))
            L = Csr.from_data(l_data, strategy="classical")
            Lt = Csr.from_data(l_data.conj_transpose().sort_row_major(),
                               strategy="classical")
            return Factorization(l_factor=L, u_factor=Lt, symmetric=True)
        rows = [dict() for _ in range(n)]
        for i, j, v in zip(d.row_idx, d.col_idx, d.values):
            if j <= i:
                rows[int(i)][int(j)] = v
        for j in range(n):
            s = rows[j].get(j, 0)
            s -= sum(abs(v) ** 2 for k, v in rows[j].items() if k < j)
            ljj = np.sqrt(abs(s))
            rows[j][j] = ljj if ljj != 0 else 1.0
            for i in range(j + 1, n):
                if j in rows[i]:
                    s = rows[i][j]
                    for k, v in rows[i].items():
                        if k < j and k in rows[j]:
                            s -= v * np.conj(rows[j][k])
                    rows[i][j] = s / rows[j][j]
        lr, lc, lv = [], [], []
        for i in range(n):
            for j, v in rows[i].items():
                lr.append(i)
                lc.append(j)
                lv.append(v)
        dtype = d.values.dtype
        l_data = MatrixData((n, n), np.asarray(lr, np.int64),
                            np.asarray(lc, np.int64), np.asarray(lv, dtype))
        L = Csr.from_data(l_data, strategy="classical")
        Lt = Csr.from_data(l_data.conj_transpose().sort_row_major(),
                           strategy="classical")
        return Factorization(l_factor=L, u_factor=Lt, symmetric=True)
