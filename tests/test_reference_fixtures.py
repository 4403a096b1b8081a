"""Validation against the reference's recorded result matrices
(/root/reference/matrices/test/*.mtx) — the same fixtures Ginkgo's own
test suite asserts against (reference/test/reorder/mc64_kernels.cpp,
reference/test/factorization/lu_kernels.cpp, cholesky_kernels.cpp,
preconditioner/isai_kernels.cpp, core/test/reorder/amd.cpp).  This
turns "reference-matching numerics" into a regression gate instead of
a claim."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import ginkgo_tpu as gt

FIX = "/root/reference/matrices/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixture dir unavailable")


def _read(name):
    return gt.read_mtx(os.path.join(FIX, name)).canonical()


def _sp(d):
    return sp.csr_matrix((d.values, (d.row_idx, d.col_idx)),
                         shape=d.shape)


# ---------------------------------------------------------------------------
# MC64 (mc64_kernels.cpp: CreatesCorrectPermutationAndScaling*Product)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mtx,result,tol", [
    ("1138_bus.mtx", "1138_bus_mc64_result.mtx", 1e-12),
    ("nontrivial_mc64_example.mtx", "nontrivial_mc64_result.mtx", 1e-6),
])
def test_mc64_matches_reference_result(mtx, result, tol):
    from ginkgo_tpu.reorder.mc64 import mc64_matching
    d = _read(mtx)
    n = d.shape[0]
    perm, rs, cs = mc64_matching(d)
    B = sp.diags(rs) @ _sp(d)[perm, :] @ sp.diags(cs)
    E = _sp(_read(result))
    assert abs(B - E).max() < tol
    # the dual-potential guarantees the old equilibration lacked:
    assert abs(B).max() <= 1 + 1e-9
    diag = np.abs(B.diagonal())
    np.testing.assert_allclose(diag, 1.0, atol=1e-9)


# ---------------------------------------------------------------------------
# LU / Cholesky numerics (lu_kernels.cpp / cholesky_kernels.cpp fixtures)
# ---------------------------------------------------------------------------

def _combined(fact):
    """L (unit diag dropped) + U as one scipy matrix — Ginkgo's
    get_combined() layout."""
    L, U = fact.unpack()
    ld, ud = L.to_matrix_data(), U.to_matrix_data()
    n = ld.shape[0]
    Ls = _sp(gt.MatrixData((n, n), ld.row_idx, ld.col_idx,
                           np.asarray(ld.values)))
    Us = _sp(gt.MatrixData((n, n), ud.row_idx, ud.col_idx,
                           np.asarray(ud.values)))
    return Ls - sp.eye(n, format="csr") + Us


@pytest.mark.parametrize("mtx,lu_ref", [
    ("ani1.mtx", "ani1_lu.mtx"),
    ("ani1_amd.mtx", "ani1_amd_lu.mtx"),
    ("ani1_nonsymm.mtx", "ani1_nonsymm_lu.mtx"),
])
def test_lu_matches_reference_fixture(mtx, lu_ref):
    from ginkgo_tpu.factorization.direct import Lu
    d = _read(mtx)
    E = _sp(_read(lu_ref))
    C = _combined(Lu().generate(d))
    # values agree on the reference's recorded (symbolic fill) pattern;
    # entries we drop must be numerically-zero fill in the reference
    assert abs(C - E).max() < 1e-10
    ours = set(zip(*C.nonzero()))
    theirs = set(zip(*E.nonzero()))
    extra = ours - theirs
    assert not extra, f"entries outside the reference pattern: {extra}"


@pytest.mark.parametrize("mtx,chol_ref", [
    ("ani1.mtx", "ani1_chol.mtx"),
    ("ani1_amd.mtx", "ani1_amd_chol.mtx"),
    ("ani4_amd.mtx", "ani4_amd_chol.mtx"),
])
def test_cholesky_matches_reference_fixture(mtx, chol_ref):
    from ginkgo_tpu.factorization.direct import Cholesky
    d = _read(mtx)
    E = _sp(_read(chol_ref))
    L, _ = Cholesky().generate(d).unpack()
    ld = L.to_matrix_data()
    Ls = _sp(gt.MatrixData(ld.shape, ld.row_idx, ld.col_idx,
                           np.asarray(ld.values)))
    assert abs(Ls - E).max() < 1e-10
    extra = set(zip(*Ls.nonzero())) - set(zip(*E.nonzero()))
    assert not extra


# ---------------------------------------------------------------------------
# AMD ordering quality (core/test/reorder/amd.cpp's fill-reduction gates)
# ---------------------------------------------------------------------------

def _chol_fill(d, perm=None):
    """nnz of the Cholesky factor of the (permuted) pattern."""
    n = d.shape[0]
    A = _sp(d)
    A = A + A.T
    if perm is not None:
        A = A[perm][:, perm]
    # symbolic elimination via sparse LU of pattern+identity shift to
    # dodge numerical zeros — use scipy's symbolic through splu on a
    # strongly diagonally dominant proxy with the same pattern
    P = sp.csr_matrix(
        (np.ones_like(A.data), A.indices, A.indptr), shape=A.shape)
    P = (P + sp.eye(n) * (n + 1)).tocoo()
    from ginkgo_tpu.factorization.direct import Cholesky
    dd = gt.MatrixData((n, n), P.row.astype(np.int64),
                       P.col.astype(np.int64), P.data)
    L, _ = Cholesky().generate(dd).unpack()
    return L.nnz


@pytest.mark.parametrize("mtx,reduction", [
    ("ani1.mtx", 60),          # amd.cpp: fillin_reduction = 60
])
def test_amd_fill_reduction(mtx, reduction):
    from ginkgo_tpu.reorder import Amd
    d = _read(mtx)
    perm = np.asarray(Amd.build().generate(d).perm)
    # the reference counts fill-in over the full symmetric factor
    # (both triangles): 2*nnz(L) - n
    n = d.shape[0]
    fill0 = 2 * _chol_fill(d) - n
    fill1 = 2 * _chol_fill(d, perm) - n
    assert fill1 <= fill0 - reduction


@pytest.mark.parametrize("mtx,ref_mtx", [
    ("ani1.mtx", "ani1_amd.mtx"),
    ("ani4.mtx", "ani4_amd.mtx"),
])
def test_amd_quality_vs_reference_ordering(mtx, ref_mtx):
    """Our AMD's fill is within 10% of the reference's recorded AMD
    ordering (aniX_amd.mtx is aniX permuted by Ginkgo's AMD)."""
    from ginkgo_tpu.reorder import Amd
    d = _read(mtx)
    d_ref = _read(ref_mtx)
    perm = np.asarray(Amd.build().generate(d).perm)
    ours = _chol_fill(d, perm)
    theirs = _chol_fill(d_ref)
    assert ours <= 1.1 * theirs


# ---------------------------------------------------------------------------
# ISAI inverses (isai_kernels.cpp fixtures)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mtx,inv_ref,mode", [
    ("isai_l.mtx", "isai_l_inv.mtx", "lower"),
    ("isai_u.mtx", "isai_u_inv.mtx", "upper"),
    ("isai_a.mtx", "isai_a_inv.mtx", "general"),
])
def test_isai_matches_reference_inverse(mtx, inv_ref, mode):
    from ginkgo_tpu.preconditioner.isai import generate_isai
    d = _read(mtx)
    M = generate_isai(gt.Csr.from_data(d, dtype=np.float64), 1, mode)
    md = M.to_matrix_data()
    Ms = _sp(gt.MatrixData(md.shape, md.row_idx, md.col_idx,
                           np.asarray(md.values)))
    E = _read(inv_ref)
    # entries the reference's subwarp kernel could not produce (pattern
    # wider than 32 -> deferred to its separate "excess" solve) carry a
    # literal 12345.0 sentinel in the fixture; we solve those rows
    # exactly in the same batched pass, so compare non-sentinel entries
    # and check the sentinel rows satisfy the ISAI minimization
    real = E.values != 12345.0
    ours_at = np.asarray(
        Ms[E.row_idx[real], E.col_idx[real]]).ravel()
    np.testing.assert_allclose(ours_at, E.values[real],
                               rtol=1e-8, atol=1e-8)
    A = _sp(d)
    R = (Ms @ A - sp.eye(d.shape[0])).tocsr()
    for i in np.unique(E.row_idx[~real]):
        Ji = Ms[i].indices
        assert np.abs(np.asarray(R[i, Ji].todense())).max() < 1e-6
