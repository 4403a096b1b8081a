"""ParILUT/ParICT, ISAI, SOR/Gauss-Seidel tests
(reference/test/factorization/par_ilut_kernels.cpp,
reference/test/preconditioner/{isai,sor}_kernels.cpp analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr
from ginkgo_tpu.factorization.par_ilu import Ilu0
from ginkgo_tpu.factorization.par_ilut import ParIct, ParIlut
from ginkgo_tpu.preconditioner.ilu import Ilu, Ic
from ginkgo_tpu.preconditioner.isai import Isai, generate_isai
from ginkgo_tpu.preconditioner.sor import GaussSeidel, Sor
from ginkgo_tpu.solver import Bicgstab, Cg, Ir
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import (generate_random_matrix, make_spd,
                                         stencil_2d)


def _spd(n=40, seed=0, shift=1.0):
    data = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 6), seed=seed), shift=shift)
    return Csr.from_data(data), data


# -- ParILUT -------------------------------------------------------------------

def test_par_ilut_improves_on_ilu0():
    """With fill, ||A - LU|| should not exceed the ILU(0) residual much."""
    A, data = _spd(40, seed=1)
    dense = np.asarray(A.to_dense())
    f0 = Ilu0().generate(A)
    r0 = np.linalg.norm(dense - np.asarray(f0.l_factor.to_dense())
                        @ np.asarray(f0.u_factor.to_dense()))
    ft = ParIlut(iterations=4, fill_in_limit=3.0).generate(A)
    rt = np.linalg.norm(dense - np.asarray(ft.l_factor.to_dense())
                        @ np.asarray(ft.u_factor.to_dense()))
    assert rt <= r0 * 1.05 + 1e-12


def test_par_ilut_respects_fill_limit():
    A, data = _spd(30, seed=2)
    nnz0 = data.canonical().nnz
    f = ParIlut(iterations=3, fill_in_limit=1.5).generate(A)
    total = f.l_factor.nnz + f.u_factor.nnz
    # L gets a unit diagonal appended; allow it in the budget check
    assert total <= 1.5 * nnz0 + A.shape[0] + 2


def test_par_ilut_preconditions():
    rng = np.random.default_rng(3)
    data = generate_random_matrix(50, 50, nonzeros_per_row=(2, 6), seed=3)
    dense = data.to_dense()
    dense += np.diag(np.abs(dense).sum(1) + 1)
    A = Csr.from_dense(dense)
    b = jnp.ones(50)
    crit = Iteration(500) | ResidualNorm(1e-11)
    plain = Bicgstab.solve(A, b, criteria=crit)
    prec = Bicgstab.solve(A, b, criteria=crit,
                          preconditioner=Ilu(ParIlut(iterations=3)))
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0])


def test_par_ict_spd():
    A, data = _spd(30, seed=4, shift=2.0)
    f = ParIct(iterations=3, fill_in_limit=2.0).generate(A)
    L = np.asarray(f.l_factor.to_dense())
    dense = np.asarray(A.to_dense())
    # L L^T approximates A
    rel = np.linalg.norm(dense - L @ L.T) / np.linalg.norm(dense)
    assert rel < 0.3
    res = Cg.solve(A, jnp.ones(30), preconditioner=Ic(f),
                   criteria=Iteration(300) | ResidualNorm(1e-10))
    assert bool(res.converged.all())


# -- ISAI ----------------------------------------------------------------------

def test_isai_lower_exact_on_full_pattern():
    """With the full lower-triangular pattern the ISAI IS the inverse."""
    rng = np.random.default_rng(5)
    dense = np.tril(rng.uniform(0.5, 1.5, (10, 10)))
    L = Csr.from_dense(dense)
    M = generate_isai(L, sparsity_power=10, mode="lower")
    np.testing.assert_allclose(np.asarray(M.to_dense()),
                               np.linalg.inv(dense), rtol=1e-8, atol=1e-10)


def test_isai_rows_satisfy_local_equations():
    """Each ISAI row solves A(J,J)^T m = e_i|J exactly."""
    A, data = _spd(20, seed=6)
    M = generate_isai(A, mode="general")
    dense = np.asarray(A.to_dense())
    md = M.to_matrix_data()
    m_dense = md.to_dense()
    for i in range(20):
        J = np.sort(md.col_idx[md.row_idx == i])
        ei = (J == i).astype(float)
        resid = dense[np.ix_(J, J)].T @ m_dense[i, J] - ei
        np.testing.assert_allclose(resid, 0, atol=1e-10)


def test_isai_dia_fill_matches_host_fill(monkeypatch):
    """The device-resident DIA block fill (banded matrices) must agree
    bit-for-bit with the native/numpy host fill across modes and
    sparsity powers (isai_kernels.cpp on-device generate analog)."""
    import ginkgo_tpu.preconditioner.isai as isai_mod
    from ginkgo_tpu.utils.generators import stencil_2d, stencil_3d
    cases = [(stencil_3d(6, points=27), "general", 1),
             (stencil_2d(16, points=9), "lower", 1),
             (stencil_2d(10, points=5), "general", 2)]
    for data, mode, power in cases:
        A = Csr.from_data(data)
        M_dia = isai_mod.generate_isai(A, power, mode)
        assert isai_mod._isai_fill_dia(
            data.canonical(), M_dia.to_matrix_data().row_idx.astype(
                np.int64), M_dia.to_matrix_data().col_idx.astype(
                np.int64), M_dia.nnz) is not None  # the fast path fired
        with monkeypatch.context() as m:
            m.setattr(isai_mod, "_isai_fill_dia", lambda *a, **k: None)
            M_host = isai_mod.generate_isai(A, power, mode)
        assert M_dia.nnz == M_host.nnz
        # identical systems, different padding layout -> ULP-level
        # arithmetic-order differences in the batched solve
        np.testing.assert_allclose(np.asarray(M_dia.to_dense()),
                                   np.asarray(M_host.to_dense()),
                                   rtol=1e-12, atol=1e-13)


def test_isai_preconditions_cg():
    A, data = _spd(60, seed=7)
    b = jnp.ones(60)
    crit = Iteration(800) | ResidualNorm(1e-10)
    plain = Cg.solve(A, b, criteria=crit)
    prec = Cg.solve(A, b, criteria=crit,
                    preconditioner=Isai(mode="spd").generate(A))
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0]) + 5


# -- SOR / Gauss-Seidel ---------------------------------------------------------

def test_sor_forward_matches_formula():
    A, data = _spd(15, seed=8)
    w = 1.3
    M = Sor(relaxation_factor=w).generate(A)
    dense = np.asarray(A.to_dense())
    D = np.diag(np.diag(dense))
    L = np.tril(dense, -1)
    b = np.random.default_rng(9).standard_normal(15)
    want = np.linalg.solve(D / w + L, b)
    np.testing.assert_allclose(M.apply(jnp.asarray(b)), want, rtol=1e-10)


def test_ssor_matches_formula():
    A, data = _spd(15, seed=10)
    w = 1.2
    M = Sor(relaxation_factor=w, symmetric=True).generate(A)
    dense = np.asarray(A.to_dense())
    D = np.diag(np.diag(dense))
    L = np.tril(dense, -1)
    U = np.triu(dense, 1)
    Mssor = w / (2 - w) * (D / w + L) @ np.linalg.inv(D) @ (D / w + U)
    b = np.random.default_rng(11).standard_normal(15)
    want = np.linalg.solve(Mssor, b)
    np.testing.assert_allclose(M.apply(jnp.asarray(b)), want, rtol=1e-10)


def test_gauss_seidel_richardson_converges():
    A, data = _spd(30, seed=12, shift=2.0)
    M = GaussSeidel().generate(A)
    res = Ir.solve(A, jnp.ones(30), solver=M,
                   criteria=Iteration(500) | ResidualNorm(1e-10))
    assert bool(res.converged.all())


def test_ssor_preconditioned_cg():
    data = stencil_2d(10, points=5)
    A = Csr.from_data(data)
    b = jnp.ones(100)
    crit = Iteration(500) | ResidualNorm(1e-10)
    plain = Cg.solve(A, b, criteria=crit)
    prec = Cg.solve(A, b, criteria=crit,
                    preconditioner=Sor(relaxation_factor=1.5,
                                       symmetric=True).generate(A))
    assert bool(prec.converged.all())
    assert int(prec.iterations[0]) <= int(plain.iterations[0])
    serial = np.linalg.solve(data.to_dense(), np.ones(100))
    np.testing.assert_allclose(prec.x, serial, rtol=1e-6, atol=1e-7)


def test_sor_invalid_omega():
    with pytest.raises(ValueError):
        Sor(relaxation_factor=2.5)


def test_gauss_jordan_batched_inverse_matches_numpy():
    """TPU-safe block inversion (ops/gauss_jordan.py): XLA's LU custom
    call is f32/c64-only on TPU, so f64/c128 block-Jacobi/ISAI/batch
    inversions route through the vmapped partial-pivot Gauss-Jordan —
    the jacobi_generate_kernels invert_block analog."""
    import jax
    import jax.numpy as jnp
    from ginkgo_tpu.ops.gauss_jordan import (_gauss_jordan_inverse_single,
                                             batched_inverse, batched_solve)

    rng = np.random.default_rng(11)
    for dtype in (np.float64, np.complex128):
        blocks = rng.standard_normal((6, 5, 5))
        if np.dtype(dtype).kind == "c":
            blocks = blocks + 1j * rng.standard_normal((6, 5, 5))
        blocks = blocks + 5 * np.eye(5)       # well-conditioned
        got = np.asarray(jax.vmap(_gauss_jordan_inverse_single)(
            jnp.asarray(blocks, dtype)))
        want = np.linalg.inv(blocks)
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)
        # public entry points agree with numpy too (any backend)
        np.testing.assert_allclose(
            np.asarray(batched_inverse(jnp.asarray(blocks, dtype))), want,
            rtol=1e-11, atol=1e-11)
        rhs = rng.standard_normal((6, 5)).astype(dtype)
        np.testing.assert_allclose(
            np.asarray(batched_solve(jnp.asarray(blocks, dtype),
                                     jnp.asarray(rhs))),
            np.einsum("bij,bj->bi", want, rhs), rtol=1e-11, atol=1e-11)


def test_gauss_jordan_needs_pivoting_and_singular_convention():
    """A zero leading pivot must be handled by the row swap; a fully
    singular block degrades via the pivot->1 convention instead of NaN."""
    import jax
    import jax.numpy as jnp
    from ginkgo_tpu.ops.gauss_jordan import _gauss_jordan_inverse_single

    blk = np.array([[0.0, 2.0], [3.0, 1.0]])
    got = np.asarray(_gauss_jordan_inverse_single(jnp.asarray(blk)))
    np.testing.assert_allclose(got, np.linalg.inv(blk), rtol=1e-12)

    sing = jnp.zeros((3, 3))
    out = np.asarray(_gauss_jordan_inverse_single(sing))
    assert np.isfinite(out).all()


def test_par_ilut_device_sweep_mode_quality():
    """sweep_mode='device' (pair-list segment_sum Jacobi sweeps, the
    common/cuda_hip par_ilut_sweep_kernels analog) must reach the same
    factorization quality as the host Gauss-Seidel path."""
    A, data = _spd(48, seed=5)
    dense = np.asarray(A.to_dense())

    def resid(f):
        return np.linalg.norm(dense
                              - np.asarray(f.l_factor.to_dense())
                              @ np.asarray(f.u_factor.to_dense()))

    host = ParIlut(iterations=4, fill_in_limit=2.0,
                   sweep_mode="host").generate(A)
    dev = ParIlut(iterations=4, fill_in_limit=2.0,
                  sweep_mode="device").generate(A)
    r_h, r_d = resid(host), resid(dev)
    assert r_d <= max(1.5 * r_h, r_h + 1e-8), (r_d, r_h)
    # both factorizations share the fill budget
    assert abs((dev.l_factor.nnz + dev.u_factor.nnz)
               - (host.l_factor.nnz + host.u_factor.nnz)) \
        <= 0.2 * (host.l_factor.nnz + host.u_factor.nnz)


def test_isai_packed_fill_matches_host_fill(monkeypatch):
    """The device-resident unstructured block fill (identity slab + one
    scatter of cached pattern pairs, isai_kernels.cpp on-device analog
    for ANY pattern) must agree with the host fill on scattered
    matrices, and a same-pattern regenerate must hit the symbolics
    cache."""
    import ginkgo_tpu.preconditioner.isai as isai_mod
    rng = np.random.default_rng(9)
    n, per = 600, 6
    r = np.repeat(np.arange(n), per)
    c = np.clip(r + rng.integers(-120, 120, r.size), 0, n - 1)
    from ginkgo_tpu.base.matrix_data import MatrixData
    data = MatrixData(
        (n, n), np.concatenate([r, np.arange(n)]),
        np.concatenate([c, np.arange(n)]),
        np.concatenate([rng.standard_normal(r.size) * 0.1,
                        np.full(n, 5.0)])).canonical()
    A = Csr.from_data(data)
    isai_mod._ISAI_SYM_CACHE.clear()
    for mode in ("general", "lower"):
        with monkeypatch.context() as m:
            m.setattr(isai_mod, "_want_packed_fill",
                      lambda *a, **k: True)
            M_dev = isai_mod.generate_isai(A, 1, mode)
            sym_calls = []
            real = isai_mod._isai_packed_symbolics
            m.setattr(isai_mod, "_isai_packed_symbolics",
                      lambda *a, **k: sym_calls.append(1) or real(*a, **k))
            M_dev2 = isai_mod.generate_isai(A, 1, mode)
            assert sym_calls == []          # cache hit: no re-planning
        with monkeypatch.context() as m:
            m.setattr(isai_mod, "_want_packed_fill",
                      lambda *a, **k: False)
            M_host = isai_mod.generate_isai(A, 1, mode)
        assert M_dev.nnz == M_host.nnz
        np.testing.assert_allclose(np.asarray(M_dev.to_dense()),
                                   np.asarray(M_host.to_dense()),
                                   rtol=1e-10, atol=1e-11)
        np.testing.assert_allclose(np.asarray(M_dev2.to_dense()),
                                   np.asarray(M_dev.to_dense()),
                                   rtol=0, atol=0)
