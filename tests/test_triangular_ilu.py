"""Triangular solvers + ILU/IC factorizations + preconditioners
(reference/test/solver/{lower,upper}_trs_kernels.cpp,
reference/test/factorization/par_ilu_kernels.cpp analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr
from ginkgo_tpu.factorization.par_ilu import Ic0, Ilu0, ParIc, ParIlu
from ginkgo_tpu.preconditioner.ilu import Ic, Ilu
from ginkgo_tpu.solver import Bicgstab, Cg
from ginkgo_tpu.solver.triangular import LowerTrs, UpperTrs, compute_levels
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import (generate_random_matrix, make_spd,
                                         stencil_2d, stencil_3d)


def _rand_lower(n=20, seed=0, unit=False):
    rng = np.random.default_rng(seed)
    dense = np.tril(rng.uniform(0.1, 1.0, (n, n)))
    dense[rng.uniform(size=(n, n)) > 0.3] = 0           # sparsify
    np.fill_diagonal(dense, 1.0 if unit else rng.uniform(1.0, 2.0, n))
    dense = np.tril(dense)
    return dense


def test_lower_trs_level():
    dense = _rand_lower(25, seed=1)
    L = Csr.from_dense(dense)
    op = LowerTrs.build().generate(L)
    b = jnp.asarray(np.random.default_rng(2).standard_normal((25, 2)))
    x = op.apply(b)
    np.testing.assert_allclose(x, np.linalg.solve(dense, np.asarray(b)),
                               rtol=1e-12)


def test_upper_trs_level():
    dense = _rand_lower(25, seed=3).T.copy()
    U = Csr.from_dense(dense)
    op = UpperTrs.build().generate(U)
    b = jnp.asarray(np.random.default_rng(4).standard_normal(25))
    np.testing.assert_allclose(op.apply(b),
                               np.linalg.solve(dense, np.asarray(b)),
                               rtol=1e-12)


def test_trs_jacobi_exact_with_enough_sweeps():
    dense = _rand_lower(20, seed=5)
    L = Csr.from_dense(dense)
    op = LowerTrs.build(algorithm="jacobi").generate(L)  # sweeps=0 -> #levels
    b = jnp.asarray(np.random.default_rng(6).standard_normal(20))
    np.testing.assert_allclose(op.apply(b),
                               np.linalg.solve(dense, np.asarray(b)),
                               rtol=1e-10)


def test_trs_jacobi_approximate():
    dense = _rand_lower(30, seed=7)
    L = Csr.from_dense(dense)
    exact = np.linalg.solve(dense, np.ones(30))
    op1 = LowerTrs.build(algorithm="jacobi", sweeps=1).generate(L)
    op8 = LowerTrs.build(algorithm="jacobi", sweeps=40).generate(L)
    e1 = np.linalg.norm(np.asarray(op1.apply(jnp.ones(30))) - exact)
    e8 = np.linalg.norm(np.asarray(op8.apply(jnp.ones(30))) - exact)
    assert e8 < e1 * 1e-3 + 1e-12


def test_compute_levels():
    # bidiagonal lower: level[i] = i (fully sequential chain)
    n = 6
    r = np.array([0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5])
    c = np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5])
    lv = compute_levels(n, r, c, lower=True)
    np.testing.assert_array_equal(lv, np.arange(n))
    # diagonal-only: all level 0
    lv0 = compute_levels(3, np.arange(3), np.arange(3), lower=True)
    np.testing.assert_array_equal(lv0, 0)


def test_ilu0_exact_dense_matches_lu_on_full_pattern():
    """On a fully dense matrix ILU(0) == LU."""
    rng = np.random.default_rng(8)
    dense = rng.standard_normal((8, 8)) + 8 * np.eye(8)
    A = Csr.from_dense(dense)
    f = Ilu0().generate(A)
    L = np.asarray(f.l_factor.to_dense())
    U = np.asarray(f.u_factor.to_dense())
    np.testing.assert_allclose(L @ U, dense, rtol=1e-10, atol=1e-12)


def test_par_ilu_converges_to_ilu0():
    data = make_spd(generate_random_matrix(
        30, 30, nonzeros_per_row=(2, 5), seed=9), shift=2.0)
    A = Csr.from_data(data)
    exact = Ilu0().generate(A)
    par = ParIlu(iterations=30).generate(A)
    np.testing.assert_allclose(np.asarray(par.l_factor.to_dense()),
                               np.asarray(exact.l_factor.to_dense()),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.u_factor.to_dense()),
                               np.asarray(exact.u_factor.to_dense()),
                               rtol=1e-6, atol=1e-8)


def test_ic0_full_pattern_matches_cholesky():
    rng = np.random.default_rng(10)
    B = rng.standard_normal((7, 7))
    dense = B @ B.T + 7 * np.eye(7)
    A = Csr.from_dense(dense)
    f = Ic0().generate(A)
    L = np.asarray(f.l_factor.to_dense())
    np.testing.assert_allclose(L, np.linalg.cholesky(dense), rtol=1e-10)
    # u_factor is L^H
    np.testing.assert_allclose(np.asarray(f.u_factor.to_dense()), L.T,
                               rtol=1e-10)


def test_par_ic_converges_to_ic0():
    data = make_spd(generate_random_matrix(
        25, 25, nonzeros_per_row=(2, 4), seed=11), shift=2.0)
    A = Csr.from_data(data)
    exact = Ic0().generate(A)
    par = ParIc(iterations=40).generate(A)
    np.testing.assert_allclose(np.asarray(par.l_factor.to_dense()),
                               np.asarray(exact.l_factor.to_dense()),
                               rtol=1e-5, atol=1e-7)


def test_ilu_preconditioned_bicgstab():
    """ilu-preconditioned-solver example analog."""
    rng = np.random.default_rng(12)
    data = generate_random_matrix(60, 60, nonzeros_per_row=(2, 6), seed=12)
    dense = data.to_dense()
    dense += np.diag(np.abs(dense).sum(1) + 1.0)
    A = Csr.from_dense(dense)
    x_true = jnp.asarray(rng.standard_normal(60))
    b = A.apply(x_true)
    crit = Iteration(500) | ResidualNorm(1e-12)
    plain = Bicgstab.solve(A, b, criteria=crit)
    prec = Bicgstab.solve(A, b, criteria=crit, preconditioner=Ilu())
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0])
    np.testing.assert_allclose(prec.x, x_true, rtol=1e-7, atol=1e-8)


def test_ic_preconditioned_cg():
    data = make_spd(generate_random_matrix(
        80, 80, nonzeros_per_row=(3, 8), seed=13), shift=1.0)
    A = Csr.from_data(data)
    rng = np.random.default_rng(14)
    x_true = jnp.asarray(rng.standard_normal(80))
    b = A.apply(x_true)
    crit = Iteration(500) | ResidualNorm(1e-12)
    plain = Cg.solve(A, b, criteria=crit)
    prec = Cg.solve(A, b, criteria=crit, preconditioner=Ic())
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0])
    np.testing.assert_allclose(prec.x, x_true, rtol=1e-7, atol=1e-8)


def test_ilu_with_relaxed_trisolves():
    """ir-ilu-preconditioned-solver analog: approximate jacobi trisolves."""
    data = make_spd(generate_random_matrix(
        50, 50, nonzeros_per_row=(2, 5), seed=15), shift=1.0)
    A = Csr.from_data(data)
    b = jnp.ones(50)
    M = Ilu(factorization=ParIlu(iterations=10),
            l_solver=LowerTrs.build(algorithm="jacobi", sweeps=3),
            u_solver=UpperTrs.build(algorithm="jacobi", sweeps=3))
    res = Bicgstab.solve(A, b, preconditioner=M,
                         criteria=Iteration(500) | ResidualNorm(1e-10))
    assert bool(res.converged.all())


def test_ilu_poisson_2d():
    data = stencil_2d(12, points=5)
    A = Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    crit = Iteration(1000) | ResidualNorm(1e-11)
    plain = Cg.solve(A, b, criteria=crit)
    prec = Cg.solve(A, b, criteria=crit, preconditioner=Ic(ParIc(15)))
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) < int(plain.iterations[0])


def test_ilu0_ic0_native_matches_python_fallback():
    """gt_ilu0/gt_ic0 produce the same factors as the dict-based host
    elimination (both restricted to A's pattern), real and complex."""
    import os
    from ginkgo_tpu.factorization.par_ilu import Ic0, Ilu0
    from ginkgo_tpu.utils.generators import make_spd, stencil_2d

    data = make_spd(stencil_2d(12, points=9), shift=4.0)

    def factors(cls):
        f = cls().generate(Csr.from_data(data))
        L, U = f.unpack()
        return (np.asarray(L.to_dense()), np.asarray(U.to_dense()))

    from ginkgo_tpu import native
    if native.lib() is None:
        import pytest
        pytest.skip("native unavailable")
    ln, un = factors(Ilu0)
    os.environ["GINKGO_TPU_NO_NATIVE"] = "1"
    native._lib, native._tried = None, True
    try:
        lp, up = factors(Ilu0)
    finally:
        del os.environ["GINKGO_TPU_NO_NATIVE"]
        native._tried = False
    np.testing.assert_allclose(ln, lp, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(un, up, rtol=1e-12, atol=1e-12)

    ln, un = factors(Ic0)
    native._lib, native._tried = None, True
    os.environ["GINKGO_TPU_NO_NATIVE"] = "1"
    try:
        lp, up = factors(Ic0)
    finally:
        del os.environ["GINKGO_TPU_NO_NATIVE"]
        native._tried = False
    np.testing.assert_allclose(ln, lp, rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(un, up, rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_ic0_scales_to_262k():
    """The native IC(0) factors a 262k-row 27-pt stencil in seconds (the
    python fallback's O(n^2) column loop needed hours here)."""
    import time
    from ginkgo_tpu import native
    from ginkgo_tpu.factorization.par_ilu import Ic0
    from ginkgo_tpu.utils.generators import stencil_3d

    if native.lib() is None:
        import pytest
        pytest.skip("native unavailable")
    data = stencil_3d(64, points=27)
    t0 = time.time()
    f = Ic0().generate(Csr.from_data(data))
    elapsed = time.time() - t0
    L, _ = f.unpack()
    assert L.nnz > 3_000_000
    # generous bound that still catches the O(n^2) fallback (hours);
    # measured 28 s idle, but xdist + concurrent compiles can double it
    assert elapsed < 120, f"IC(0) too slow: {elapsed:.0f}s"


def test_trisolve_jacobi_full_sweeps_is_exact():
    """sweeps=0 (num_levels) jacobi sweeps reproduce the substitution
    exactly (nilpotent off part) — the basis for algorithm='auto'
    picking the sweep form on TPU."""
    from ginkgo_tpu.solver.triangular import LowerTrs, UpperTrs
    from ginkgo_tpu.utils.generators import make_spd, stencil_2d

    data = make_spd(stencil_2d(12, points=9), shift=4.0)
    A = Csr.from_data(data)
    d = data.canonical()
    lo = d.col_idx <= d.row_idx
    from ginkgo_tpu.base.matrix_data import MatrixData
    L = Csr.from_data(MatrixData(d.shape, d.row_idx[lo], d.col_idx[lo],
                                 d.values[lo]))
    b = jnp.asarray(np.random.default_rng(0).standard_normal(144))
    for factory, mode in ((LowerTrs, "level"), (LowerTrs, "jacobi"),
                          (LowerTrs, "auto")):
        x = factory.build(algorithm=mode).generate(L).apply(b)
        oracle = LowerTrs.build(algorithm="level").generate(L).apply(b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(oracle),
                                   rtol=1e-12, atol=1e-12)
    U = Csr.from_data(MatrixData(d.shape, d.col_idx[lo], d.row_idx[lo],
                                 d.values[lo]))
    for mode in ("level", "jacobi", "auto"):
        x = UpperTrs.build(algorithm=mode).generate(U).apply(b)
        oracle = UpperTrs.build(algorithm="level").generate(U).apply(b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(oracle),
                                   rtol=1e-12, atol=1e-12)


def test_exact_block_trisolve_matches_level():
    """algorithm='exact' (block-partitioned inverse, ops/tri_banded.py) is
    bit-accurate-class exact: matches the level-scheduled substitution on
    banded L and U factors, multi-RHS included (VERDICT r3 missing #3;
    reference syncfree kernels cuda/solver/common_trs_kernels.cuh)."""
    from ginkgo_tpu.solver.triangular import LowerTrs, UpperTrs
    from ginkgo_tpu.utils.generators import make_spd, stencil_3d
    from ginkgo_tpu.base.matrix_data import MatrixData

    d = make_spd(stencil_3d(8, points=27), shift=4.0).canonical()
    n = d.shape[0]
    lo = d.col_idx <= d.row_idx
    L = Csr.from_data(MatrixData(d.shape, d.row_idx[lo], d.col_idx[lo],
                                 d.values[lo]))
    U = Csr.from_data(MatrixData(d.shape, d.col_idx[lo], d.row_idx[lo],
                                 d.values[lo]))
    b = jnp.asarray(np.random.default_rng(7).standard_normal((n, 3)))
    for factory, T in ((LowerTrs, L), (UpperTrs, U)):
        ex = factory.build(algorithm="exact").generate(T)
        assert ex.algorithm == "exact"
        lv = factory.build(algorithm="level").generate(T)
        np.testing.assert_allclose(np.asarray(ex.apply(b)),
                                   np.asarray(lv.apply(b)),
                                   rtol=1e-11, atol=1e-11)
    # auto resolves to the block-inverse path for banded factors
    assert LowerTrs.build().generate(L).algorithm == "exact"


def test_exact_block_trisolve_rejects_unstructured():
    from ginkgo_tpu.solver.triangular import LowerTrs

    rng = np.random.default_rng(9)
    # n=200 with scattered strictly-lower entries -> far more than 64
    # distinct diagonal offsets, so the banded plan must refuse
    dense = np.tril(rng.standard_normal((200, 200))
                    * (rng.random((200, 200)) < 0.3)) + np.eye(200) * 4
    Lg = Csr.from_dense(dense)
    with pytest.raises(ValueError, match="exact"):
        LowerTrs.build(algorithm="exact").generate(Lg)
    # auto falls back silently
    op = LowerTrs.build().generate(Lg)
    assert op.algorithm in ("level", "jacobi")
    np.testing.assert_allclose(
        np.asarray(op.apply(jnp.ones(200))),
        np.linalg.solve(dense, np.ones(200)), rtol=1e-9, atol=1e-9)


def test_exact_block_trisolve_jittable_and_complex():
    import jax
    from ginkgo_tpu.solver.triangular import LowerTrs
    from ginkgo_tpu.base.matrix_data import MatrixData

    n = 300
    rng = np.random.default_rng(11)
    rows = np.concatenate([np.arange(n), np.arange(1, n), np.arange(17, n)])
    cols = np.concatenate([np.arange(n), np.arange(n - 1),
                           np.arange(n - 17)])
    vals = (rng.standard_normal(rows.size)
            + 1j * rng.standard_normal(rows.size)).astype(np.complex128)
    vals[:n] += 6.0
    L = Csr.from_data(MatrixData((n, n), rows, cols, vals))
    op = LowerTrs.build(algorithm="exact").generate(L)
    b = jnp.asarray(rng.standard_normal(n).astype(np.complex128))
    x = jax.jit(lambda o, v: o.apply(v))(op, b)
    dense = np.asarray(L.to_dense())
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(dense,
                                                              np.asarray(b)),
                               rtol=1e-9, atol=1e-9)


def test_par_ilu_jacobi_sweeps_stay_bounded_on_poisson():
    """Round-4 regression: the functional (Jacobi) Chow-Patel sweep
    DIVERGED on the 27-pt Poisson M-matrix when seeded with raw a_ij
    (max|l| 8.1 after 5 sweeps, 410 after 15 — the reference seeds raw
    values too but sweeps in place, factorization_kernels.cpp
    initialize_l_u).  With the paper's scaled init l_ij = a_ij/a_jj the
    iteration settles by sweep 2; more sweeps must not be worse."""
    data = stencil_3d(12, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    dense = np.asarray(A.to_dense(), np.float64)
    prev = None
    for iters in (5, 15):
        f = ParIlu(iterations=iters).generate(A)
        d = f.l_factor.to_matrix_data().canonical()
        off = d.values[d.row_idx != d.col_idx]
        assert np.abs(off).max() < 1.0, (iters, np.abs(off).max())
        resid = np.linalg.norm(
            dense - np.asarray(f.l_factor.to_dense(), np.float64)
            @ np.asarray(f.u_factor.to_dense(), np.float64))
        if prev is not None:
            assert resid <= prev * 1.01, (resid, prev)
        prev = resid


def test_par_ic_jacobi_sweeps_stay_bounded_on_poisson():
    """Same divergence fix for ParIC: scaled init l_ij = a_ij/sqrt(a_jj)
    (reference par_ic_kernels.cpp init_factor takes sqrt on the diagonal
    only, but sweeps in place)."""
    data = stencil_3d(12, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    dense = np.asarray(A.to_dense(), np.float64)
    for iters in (5, 15):
        f = ParIc(iterations=iters).generate(A)
        d = f.l_factor.to_matrix_data().canonical()
        off = np.abs(d.values[d.row_idx != d.col_idx])
        assert off.max() < 2.0, (iters, off.max())
        L = np.asarray(f.l_factor.to_dense(), np.float64)
        resid = np.linalg.norm(dense - L @ L.T)
        assert resid < np.linalg.norm(dense) * 0.05, resid


def test_exact_trisolve_rejects_value_range_overflow():
    """A triangular factor whose block inverse exceeds the f32 range
    (bidiagonal growth 1.5^S > 3.4e38 within one S=256 block, still
    finite in the f64 staging) must NOT produce an inf/nan inverse
    operator: plan_block_trisolve rejects and algorithm='auto' falls
    back to the inverse-free level schedule."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.ops.tri_banded import plan_block_trisolve
    n = 4096
    rows = np.concatenate([np.arange(n), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(n - 1)])
    vals = np.concatenate([np.ones(n), np.full(n - 1, -1.5)]
                          ).astype(np.float32)
    d = MatrixData((n, n), rows, cols, vals).canonical()
    assert plan_block_trisolve(d, True, False) is None
    trs = LowerTrs.build(algorithm="auto").generate(Csr.from_data(d))
    assert trs.algorithm != "exact"


def test_packed_exact_trisolve_unstructured():
    """Unstructured factors (>64 offsets — the packed-ParILUT class)
    route to the packed exact solve (ops/tri_packed.py: device block
    inverses + ELL carry-window gathers) under algorithm='auto' at f32,
    match the level-scheduled oracle, and keep multi-RHS semantics."""
    import numpy as np
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.solver.triangular import LowerTrs, UpperTrs

    rng = np.random.default_rng(5)
    n, per = 1500, 7
    r = np.repeat(np.arange(n), per)
    c = r - rng.integers(1, 500, r.size)
    keep = c >= 0
    r, c = r[keep], c[keep]
    key = np.unique(r * n + c)
    r, c = key // n, key % n
    vals = np.concatenate([rng.standard_normal(r.size) * 0.05,
                           2.0 + rng.random(n)]).astype(np.float32)
    d = MatrixData((n, n),
                   np.concatenate([r, np.arange(n)]),
                   np.concatenate([c, np.arange(n)]), vals).canonical()
    assert np.unique(d.col_idx - d.row_idx).size > 64   # not banded

    class _Holder:
        def __init__(self, data):
            self._d = data

        def to_matrix_data(self):
            return self._d

    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    for api, data in ((LowerTrs, d),
                      (UpperTrs, MatrixData(
                          (n, n), d.col_idx.copy(), d.row_idx.copy(),
                          d.values.copy()).canonical())):
        op = api.build().generate(_Holder(data))
        assert op.algorithm == "exact_packed", op.algorithm
        x = np.asarray(op._apply(b))
        ref = api.build(algorithm="level").generate(_Holder(data))
        xr = np.asarray(ref._apply(b))
        scale = np.abs(xr).max()
        assert np.abs(x - xr).max() / scale < 1e-5, api.name


@pytest.mark.slow
def test_packed_trisolve_pallas_interpret_vs_scipy():
    """The packed-trisolve Pallas kernel (interpret mode) against
    scipy's exact triangular solve — the tests/test_pallas_kernels.py
    discipline for the new kernel (the non-slow test above covers the
    reference-tier scan; this one runs the actual kernel body)."""
    import numpy as np
    import scipy.sparse as sp
    from scipy.sparse.linalg import spsolve_triangular
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.ops.tri_packed import (packed_trisolve_tpu,
                                           plan_packed_trisolve)
    rng = np.random.default_rng(7)
    n, per = 1700, 7          # 7 blocks: odd nb exercises the NB pad path
    r = np.repeat(np.arange(n), per)
    c = r - rng.integers(1, 600, r.size)
    keep = c >= 0
    r, c = r[keep], c[keep]
    key = np.unique(r * n + c)
    r, c = key // n, key % n
    d = MatrixData(
        (n, n), np.concatenate([r, np.arange(n)]),
        np.concatenate([c, np.arange(n)]),
        np.concatenate([rng.standard_normal(r.size).astype(np.float32)
                        * 0.04,
                        (2.0 + rng.random(n)).astype(np.float32)])
    ).canonical()
    plan = plan_packed_trisolve(d, True, False)
    assert plan is not None
    arrays, meta = plan
    b = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    got = np.asarray(packed_trisolve_tpu(arrays, meta, b,
                                         interpret=True))
    T = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)), shape=(n, n))
    want = np.stack([spsolve_triangular(T, np.asarray(b)[:, i].astype(
        np.float64), lower=True) for i in range(2)], 1)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_packed_trisolve_budget_and_dtype_guards(monkeypatch):
    """(a) The packed plan enforces a device-storage budget ((nb, S, S)
    inverses + cross streams) so huge factors fall back to the
    level/sweep paths instead of an HBM OOM (tri_banded's
    _MAX_INV_BYTES discipline).  (b) The symbolics cache key includes
    the values dtype KIND: a complex factor with the same pattern as a
    cached f32 one must reject (planes unsupported), never silently
    .astype(f32) through a pattern-only cache hit."""
    import numpy as np
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.ops import tri_packed as tp

    rng = np.random.default_rng(9)
    n, per = 1200, 5
    r = np.repeat(np.arange(n), per)
    c = r - rng.integers(1, 400, r.size)
    keep = c >= 0
    r, c = r[keep], c[keep]
    key = np.unique(r * n + c)
    r, c = key // n, key % n
    vals = np.concatenate([rng.standard_normal(r.size) * 0.04,
                           2.0 + rng.random(n)]).astype(np.float32)
    rows = np.concatenate([r, np.arange(n)])
    cols = np.concatenate([c, np.arange(n)])
    d = MatrixData((n, n), rows, cols, vals).canonical()

    tp._SYM_CACHE.clear()
    assert tp.plan_packed_trisolve(d, True, False) is not None
    # same pattern, complex values: must miss the f32 cache slot and
    # reject in the symbolics
    dc = MatrixData((n, n), d.row_idx.copy(), d.col_idx.copy(),
                    d.values.astype(np.complex64)).canonical()
    assert tp.plan_packed_trisolve(dc, True, False) is None
    # and the f32 slot is keyed separately: still plans afterwards
    assert tp.plan_packed_trisolve(d, True, False) is not None

    # storage budget: with a tiny budget the same factor must reject
    tp._SYM_CACHE.clear()
    monkeypatch.setattr(tp, "_MAX_PLAN_BYTES", 1 << 20)
    assert tp.plan_packed_trisolve(d, True, False) is None


def test_banded_device_inverse_matches_host_build():
    """The device-side block-inverse build (scatter the compact (D, n)
    planes into the slab on device + MXU doubling inverse) must agree
    with the host LAPACK trtri build and solve the same system; f32
    accelerator path, forced here via device_build=True."""
    import numpy as np
    import scipy.sparse as sp
    from scipy.sparse.linalg import spsolve_triangular
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.ops.tri_banded import (block_trisolve_apply,
                                           plan_block_trisolve)
    rng = np.random.default_rng(21)
    n = 1500
    offs = [0, -1, -3, -17, -160, -300]   # crosses the S=256 boundary
    rows, cols, vals = [], [], []
    for off in offs:
        r = np.arange(-off, n)
        rows.append(r)
        cols.append(r + off)
        vals.append((2.0 + rng.random(r.size) if off == 0
                     else 0.3 * rng.standard_normal(r.size)))
    d = MatrixData((n, n), np.concatenate(rows), np.concatenate(cols),
                   np.concatenate(vals).astype(np.float32)).canonical()
    host = plan_block_trisolve(d, True, False, device_build=False)
    dev = plan_block_trisolve(d, True, False, device_build=True)
    assert host is not None and dev is not None
    assert dev[1] == host[1]                       # same meta
    np.testing.assert_allclose(np.asarray(dev[0]["inv"]),
                               host[0]["inv"], rtol=2e-5, atol=2e-6)
    b = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    x = np.asarray(block_trisolve_apply(
        jnp.asarray(dev[0]["inv"]), jnp.asarray(dev[0]["ov"]),
        tuple(sorted(dev[1].items())), b))
    T = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)), shape=(n, n))
    want = np.stack([spsolve_triangular(
        T, np.asarray(b)[:, i].astype(np.float64), lower=True)
        for i in range(2)], 1)
    assert np.abs(x - want).max() / np.abs(want).max() < 1e-5


def test_exact_path_skips_level_and_sweep_arrays():
    """generate() resolves the algorithm FIRST and only builds the
    arrays that algorithm reads: the exact paths must not pay the
    level-DAG pass or the strictly-triangular Csr's SpMV planning
    (seconds on unstructured factors), and level must not carry the
    sweep operator."""
    dense = _rand_lower(300, seed=31)
    L = Csr.from_dense(dense)
    op = LowerTrs.build().generate(L)     # small dense-ish: level/jacobi
    assert op.algorithm in ("level", "jacobi")
    exact = LowerTrs.build(algorithm="level").generate(L)
    assert exact.off_op is None           # level solve never reads it
    import numpy as np
    from ginkgo_tpu.base.matrix_data import MatrixData
    n = 2048
    r = np.arange(n)
    d = MatrixData((n, n),
                   np.concatenate([r[1:], r]),
                   np.concatenate([r[:-1], r]),
                   np.concatenate([np.full(n - 1, -0.5),
                                   np.ones(n)]).astype(np.float32)
                   ).canonical()

    class _H:
        def __init__(s, dd): s._d = dd
        def to_matrix_data(s): return s._d

    ex = LowerTrs.build().generate(_H(d))
    assert ex.algorithm == "exact"
    assert ex.off_op is None and ex.num_levels == 1
    b = jnp.asarray(np.ones(n, np.float32))
    x = np.asarray(ex._apply(b[:, None]))[:, 0]
    ref = np.asarray(LowerTrs.build(algorithm="level")
                     .generate(_H(d))._apply(b[:, None]))[:, 0]
    np.testing.assert_allclose(x, ref, rtol=1e-5)
