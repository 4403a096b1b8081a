"""ParILUT / ParICT — threshold-based incomplete factorization.

Analog of ``core/factorization/par_ilut.cpp:262-350`` (SURVEY.md A.3) and
``par_ict.hpp:69``.  Each outer iteration:

1. LU = spgemm(L, U)                     (host symbolic + device numeric)
2. add_candidates: pattern(A) ∪ pattern(LU), new entries seeded with the
   residual (A - LU)_ij (scaled by u_jj for the L part)
3. one Chow-Patel sweep on the enlarged pattern (device: the par_ilu
   pair-list gather/segment-sum kernel)
4. threshold_select: k-th smallest |value| so nnz shrinks back to
   ``fill_in_limit * nnz(ILU0 pattern)`` — ``jax.lax.top_k`` territory;
   host numpy partition here since patterns are host-resident anyway
5. threshold_filter: drop below-threshold entries (diagonal always kept)
6. second sweep on the filtered pattern

Pattern evolution is inherently dynamic-shape, so the outer loop is
host-driven (generate-time, like Ginkgo's); every numeric phase runs as the
jitted static-shape sweep kernel.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..base.matrix_data import MatrixData
from ..ops.spgemm import spgemm_data
from .container import Factorization
from .par_ilu import _build_factors, _pair_lists, _run_sweeps


def _entry_dict(r, c, v):
    return {(int(i), int(j)): val for i, j, val in zip(r, c, v)}


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _sweep(n, lr, lc, lv, ur, uc, uv, la, ua, iterations):
    """Run Chow-Patel sweeps on the given split pattern; returns values.

    All device arrays are padded to power-of-two buckets so the jitted
    sweep kernel's compile cache hits across ParILUT's pattern-evolving
    outer iterations (padded entries carry zero values / dropped pair
    segments and cannot affect real outputs)."""
    pl, pu, po = _pair_lists(lr, lc, ur, uc, n)
    udiag_pos = np.full(n, -1, np.int64)
    for idx, (i, j) in enumerate(zip(ur, uc)):
        if i == j:
            udiag_pos[i] = idx

    nl, nu, np_ = len(lr), len(ur), len(pl)
    cl, cu, cp = _pow2(max(nl, 1)), _pow2(max(nu, 1)), _pow2(max(np_, 1))
    nout_pad = cl + cu

    def pad(a, cap, fill, dtype=None):
        out = np.full(cap, fill, a.dtype if dtype is None else dtype)
        out[:len(a)] = a
        return out

    lv2, uv2 = _run_sweeps(
        jnp.asarray(pad(lv, cl, 0)), jnp.asarray(pad(uv, cu, 0)),
        jnp.asarray(pad(la, cl, 0)), jnp.asarray(pad(ua, cu, 0)),
        jnp.asarray(pad(np.asarray(pl), cp, 0)),
        jnp.asarray(pad(np.asarray(pu), cp, 0)),
        # padded pairs scatter into the dropped segment
        jnp.asarray(pad(np.asarray(po)
                        + np.where(np.asarray(po) >= nl, cl - nl, 0)
                        if np_ else np.zeros(0, np.int64),
                        cp, nout_pad)),
        jnp.asarray(pad(lc, cl, 0)), jnp.asarray(udiag_pos), iterations)
    return np.asarray(lv2)[:nl], np.asarray(uv2)[:nu]


def _threshold_filter(r, c, v, keep_count, keep_diag=True):
    """Keep the ``keep_count`` largest-|v| entries (+ the diagonal)."""
    if v.shape[0] <= keep_count:
        return r, c, v
    mag = np.abs(v).astype(np.float64)
    if keep_diag:
        mag[r == c] = np.inf
    # k-th largest threshold (threshold_select analog)
    order = np.argpartition(-mag, keep_count - 1)[:keep_count]
    order = np.sort(order)
    return r[order], c[order], v[order]


class ParIlut:
    """Factory (par_ilut.hpp:72 params): ``iterations``, ``fill_in_limit``."""

    def __init__(self, iterations: int = 5, fill_in_limit: float = 2.0,
                 sweeps_per_iteration: int = 1):
        self.iterations = iterations
        self.fill_in_limit = fill_in_limit
        self.sweeps = sweeps_per_iteration

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> Factorization:
        data = A.to_matrix_data() if hasattr(A, "to_matrix_data") else A
        d = data.canonical()
        n = d.shape[0]
        aval = _entry_dict(d.row_idx, d.col_idx, d.values)
        dtype = d.values.dtype

        # initial split on A's pattern (ILU0 pattern), ParILU init values
        from .par_ilu import _split_pattern
        _, (lr, lc), (ur, uc) = _split_pattern(d)
        lv = np.array([aval.get((int(i), int(j)), 0.0)
                       for i, j in zip(lr, lc)], dtype)
        uv = np.array([aval.get((int(i), int(j)), 0.0)
                       for i, j in zip(ur, uc)], dtype)
        lv, uv = _sweep(n, lr, lc, lv, ur, uc, uv, lv.copy(), uv.copy(), 3)
        nnz_l0, nnz_u0 = len(lr), len(ur)
        keep_l = int(np.ceil(self.fill_in_limit * nnz_l0))
        keep_u = int(np.ceil(self.fill_in_limit * nnz_u0))

        for _ in range(self.iterations):
            # 1. LU product (unit diag L)
            diag = np.arange(n)
            l_full = MatrixData((n, n), np.concatenate([lr, diag]),
                                np.concatenate([lc, diag]),
                                np.concatenate([lv, np.ones(n, dtype)]))
            u_data = MatrixData((n, n), ur, uc, uv)
            lu = spgemm_data(l_full, u_data)
            lu_map = _entry_dict(lu.row_idx, lu.col_idx, lu.values)

            # 2. add_candidates: union pattern, residual-seeded new entries
            lcur = _entry_dict(lr, lc, lv)
            ucur = _entry_dict(ur, uc, uv)
            cand = set(zip(d.row_idx.tolist(), d.col_idx.tolist()))
            cand |= set(lu_map.keys())
            new_lr, new_lc, new_lv = [], [], []
            new_ur, new_uc, new_uv = [], [], []
            udiag = {int(i): uv[k] for k, (i, j) in enumerate(zip(ur, uc))
                     if i == j}
            for (i, j) in sorted(cand):
                r_ij = aval.get((i, j), 0.0) - lu_map.get((i, j), 0.0)
                if i > j:
                    if (i, j) in lcur:
                        val = lcur[(i, j)]
                    else:
                        dj = udiag.get(j, 1.0) or 1.0
                        val = r_ij / dj
                    new_lr.append(i)
                    new_lc.append(j)
                    new_lv.append(val)
                else:
                    val = ucur.get((i, j), r_ij)
                    new_ur.append(i)
                    new_uc.append(j)
                    new_uv.append(val)
            lr2 = np.asarray(new_lr, np.int64)
            lc2 = np.asarray(new_lc, np.int64)
            lv2 = np.asarray(new_lv, dtype)
            ur2 = np.asarray(new_ur, np.int64)
            uc2 = np.asarray(new_uc, np.int64)
            uv2 = np.asarray(new_uv, dtype)
            la2 = np.array([aval.get((int(i), int(j)), 0.0)
                            for i, j in zip(lr2, lc2)], dtype)
            ua2 = np.array([aval.get((int(i), int(j)), 0.0)
                            for i, j in zip(ur2, uc2)], dtype)

            # 3. sweep on the enlarged pattern
            lv2, uv2 = _sweep(n, lr2, lc2, lv2, ur2, uc2, uv2, la2, ua2,
                              self.sweeps)

            # 4+5. select + filter back to the fill budget
            lr, lc, lv = _threshold_filter(lr2, lc2, lv2, keep_l,
                                           keep_diag=False)
            ur, uc, uv = _threshold_filter(ur2, uc2, uv2, keep_u,
                                           keep_diag=True)

            # 6. second sweep on the filtered pattern
            la = np.array([aval.get((int(i), int(j)), 0.0)
                           for i, j in zip(lr, lc)], dtype)
            ua = np.array([aval.get((int(i), int(j)), 0.0)
                           for i, j in zip(ur, uc)], dtype)
            lv, uv = _sweep(n, lr, lc, lv, ur, uc, uv, la, ua, self.sweeps)

        return _build_factors(n, lr, lc, lv, ur, uc, uv, dtype)


class ParIct:
    """Threshold incomplete Cholesky (``par_ict.hpp:69``): ParILUT restricted
    to the lower triangle with U = Lᴴ."""

    def __init__(self, iterations: int = 5, fill_in_limit: float = 2.0):
        self.iterations = iterations
        self.fill_in_limit = fill_in_limit

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> Factorization:
        # run ParILUT, then symmetrise: keep the IC sweep structure simple by
        # factoring with ParIlut and rescaling L by sqrt(diag(U)).
        fact = ParIlut(self.iterations, self.fill_in_limit).generate(A)
        L, U = fact.unpack()
        ld = L.to_matrix_data()
        ud = U.to_matrix_data()
        udiag = np.ones(ld.shape[0], ud.values.dtype)
        on = ud.row_idx == ud.col_idx
        udiag[ud.row_idx[on]] = ud.values[on]
        sq = np.sqrt(np.abs(udiag))
        sq[sq == 0] = 1.0
        # L_ic = L_unit * diag(sqrt(u_jj))
        vals = ld.values * sq[ld.col_idx]
        l_data = MatrixData(ld.shape, ld.row_idx, ld.col_idx, vals)
        from ..matrix.csr import Csr
        Lic = Csr.from_data(l_data, strategy="classical")
        Lt = Csr.from_data(l_data.conj_transpose().sort_row_major(),
                           strategy="classical")
        return Factorization(l_factor=Lic, u_factor=Lt, symmetric=True)
