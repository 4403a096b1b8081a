"""Device-resident DIA ParILUT (par_ilut_dia.py): the TPU-native
reformulation of the reference's on-device ParILUT loop
(common/cuda_hip/factorization/par_ilut_{spgeam,select,filter,sweep}_
kernels.cpp; driver core/factorization/par_ilut.cpp:262-350).  The whole
candidates/select/filter/sweep loop runs as ONE jitted fori_loop on
(num_diags, n) diagonal slabs; these tests pin its quality against the
host Gauss-Seidel path and its fallback behavior."""

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu import Csr
from ginkgo_tpu.factorization.par_ilu import Ilu0
from ginkgo_tpu.factorization.par_ilut import ParIlut
from ginkgo_tpu.factorization.par_ilut_dia import generate_dia, plan_dia
from ginkgo_tpu.preconditioner.ilu import Ilu
from ginkgo_tpu.solver import Bicgstab
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import (generate_random_matrix,
                                         stencil_2d, stencil_3d)


def _full_resid(A_dense, fact):
    return np.linalg.norm(A_dense
                          - np.asarray(fact.l_factor.to_dense())
                          @ np.asarray(fact.u_factor.to_dense()))


def test_dia_plan_structured_vs_not():
    d3 = stencil_3d(6, points=27).canonical()
    plan = plan_dia(d3)
    assert plan is not None
    # universe = two-level closure of A's offsets, 0 present, ascending
    u = plan["universe"]
    assert (np.diff(u) > 0).all() and 0 in u
    oa = np.unique(d3.col_idx.astype(np.int64) - d3.row_idx)
    assert np.isin(oa, u).all()
    assert plan["n_low"] == int((u < 0).sum())
    # a scattered random pattern has ~nnz distinct offsets -> rejected
    rnd = generate_random_matrix(200, 200, nonzeros_per_row=(3, 8),
                                 seed=7).canonical()
    assert plan_dia(rnd) is None


def test_dia_beats_ilu0_and_tracks_host():
    data = stencil_3d(8, points=27)
    A = Csr.from_data(data)
    dense = np.asarray(A.to_dense())
    r_ilu0 = _full_resid(dense, Ilu0().generate(A))
    f_dia = ParIlut(iterations=4, fill_in_limit=2.0,
                    algorithm="dia").generate(A)
    f_host = ParIlut(iterations=4, fill_in_limit=2.0,
                     algorithm="general").generate(A)
    r_dia, r_host = _full_resid(dense, f_dia), _full_resid(dense, f_host)
    # fill must pay: better than no-fill ILU(0), and within a modest
    # factor of the host GS path (the device sweeps are inexact Jacobi)
    assert r_dia < r_ilu0
    assert r_dia <= 1.5 * r_host + 1e-10, (r_dia, r_host)


def test_dia_respects_fill_limit():
    data = stencil_2d(24, points=9)
    d = data.canonical()
    f = ParIlut(iterations=3, fill_in_limit=1.5,
                algorithm="dia").generate(data)
    n = d.shape[0]
    total = f.l_factor.nnz + f.u_factor.nnz
    assert total <= 1.5 * d.nnz + n + 2


def test_dia_preconditions():
    data = stencil_3d(8, points=7)
    A = Csr.from_data(data)
    n = A.shape[0]
    b = jnp.ones(n)
    crit = Iteration(400) | ResidualNorm(1e-10)
    plain = Bicgstab.solve(A, b, criteria=crit)
    pre = Ilu(ParIlut(iterations=3, algorithm="dia"))
    prec = Bicgstab.solve(A, b, criteria=crit, preconditioner=pre)
    assert bool(np.asarray(prec.converged).all())
    assert int(prec.iterations[0]) < int(plain.iterations[0])


def test_dia_requested_but_unstructured_falls_back():
    data = generate_random_matrix(60, 60, nonzeros_per_row=(2, 5), seed=9)
    dd = data.to_dense()
    dd += np.diag(np.abs(dd).sum(1) + 1)
    A = Csr.from_dense(dd)
    f = ParIlut(iterations=2, algorithm="dia").generate(A)  # host fallback
    assert f.l_factor.shape == (60, 60)
    r = _full_resid(np.asarray(A.to_dense()), f)
    assert np.isfinite(r)


def test_dia_ict_tracks_host_and_budget():
    """ParICT on slabs (generate_dia_ict): tril(L L^H) via the mirrored
    slab matches the host Gauss-Seidel ParICT's quality and budget."""
    from ginkgo_tpu.factorization.par_ilut import ParIct
    data = stencil_3d(8, points=27)
    A = Csr.from_data(data)
    dense = np.asarray(A.to_dense())
    f_dia = ParIct(iterations=4, fill_in_limit=2.0,
                   algorithm="dia").generate(A)
    f_host = ParIct(iterations=4, fill_in_limit=2.0,
                    algorithm="general").generate(A)
    r_dia, r_host = _full_resid(dense, f_dia), _full_resid(dense, f_host)
    assert r_dia <= 1.5 * r_host + 1e-10, (r_dia, r_host)
    d = data.canonical()
    low_budget = int(np.ceil(2.0 * (d.row_idx >= d.col_idx).sum()))
    assert f_dia.l_factor.nnz <= low_budget + 2
    # U = L^H exactly
    U = np.asarray(f_dia.u_factor.to_dense())
    L = np.asarray(f_dia.l_factor.to_dense())
    np.testing.assert_allclose(U, L.conj().T, rtol=0, atol=0)


def test_dia_ict_preconditions_spd():
    from ginkgo_tpu.factorization.par_ilut import ParIct
    from ginkgo_tpu.preconditioner.ilu import Ic
    from ginkgo_tpu.solver import Cg
    data = stencil_3d(8, points=7)
    A = Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    crit = Iteration(400) | ResidualNorm(1e-10)
    plain = Cg.solve(A, b, criteria=crit)
    prec = Cg.solve(A, b, criteria=crit,
                    preconditioner=Ic(ParIct(iterations=3,
                                             algorithm="dia")))
    assert bool(np.asarray(prec.converged).all())
    assert int(prec.iterations[0]) < int(plain.iterations[0])


def test_dia_complex_values():
    """Complex (Helmholtz-like shifted) stencil through the forced DIA
    path: factors stay complex, residual beats the no-fill baseline."""
    data = stencil_3d(6, points=7)
    d = data.canonical()
    vals = d.values.astype(np.complex128) * (1.0 + 0.3j)
    vals[d.row_idx == d.col_idx] = np.abs(
        d.values[d.row_idx == d.col_idx]) * (1.2 + 0.1j)
    from ginkgo_tpu.base.matrix_data import MatrixData
    dc = MatrixData(d.shape, d.row_idx, d.col_idx, vals)
    A = Csr.from_data(dc)
    dense = np.asarray(A.to_dense())
    f = ParIlut(iterations=3, fill_in_limit=2.0,
                algorithm="dia").generate(A)
    L = np.asarray(f.l_factor.to_dense())
    U = np.asarray(f.u_factor.to_dense())
    assert np.iscomplexobj(L) and np.iscomplexobj(U)
    r = np.linalg.norm(dense - L @ U)
    assert np.isfinite(r) and r < 0.1 * np.linalg.norm(dense)


def test_dia_generate_is_pure():
    """The DIA driver must not mutate the canonical MatrixData it reads
    (the round-2 Ilu0 aliasing regression class)."""
    d = stencil_3d(5, points=27).canonical()
    vals0 = d.values.copy()
    row0 = d.row_idx.copy()
    out = generate_dia(d, iterations=3, fill_in_limit=2.0, sweeps=1)
    assert out is not None
    np.testing.assert_array_equal(d.values, vals0)
    np.testing.assert_array_equal(d.row_idx, row0)
