"""Sparse-ecosystem interop (utils/interop.py): scipy.sparse and
jax.experimental.sparse BCOO/BCSR round-trips.

Reference analog: assembly interop through gko::matrix_data
(examples/external-lib-interfacing); here the ecosystems are scipy and
the JAX sparse API.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax.experimental import sparse as jsparse

import ginkgo_tpu as gt
from ginkgo_tpu.utils import (from_bcoo, from_bcsr, from_scipy, to_bcoo,
                              to_bcsr, to_scipy)


def _random_scipy(rng, n=37, m=29, density=0.12, dtype=np.float64):
    mat = sp.random(n, m, density=density, random_state=np.random.RandomState(7),
                    dtype=np.float64, format="coo")
    if np.issubdtype(dtype, np.complexfloating):
        mat = (mat + 1j * sp.random(n, m, density=density, format="coo",
                                    random_state=np.random.RandomState(8))
               ).astype(dtype)
    return mat.astype(dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_scipy_roundtrip_and_apply(rng, dtype):
    m = _random_scipy(rng, dtype=dtype)
    A = from_scipy(m)
    assert isinstance(A, gt.Csr)
    x = rng.standard_normal(m.shape[1]).astype(dtype)
    np.testing.assert_allclose(np.asarray(A.apply(jnp.asarray(x))),
                               m @ x, rtol=1e-12, atol=1e-12)
    back = to_scipy(A, format="csr")
    assert (back != m.tocsr()).nnz == 0


def test_scipy_duplicates_summed():
    m = sp.coo_matrix((np.array([1.0, 2.0, 5.0]),
                       (np.array([0, 0, 1]), np.array([1, 1, 0]))),
                      shape=(2, 2))
    A = from_scipy(m)
    np.testing.assert_allclose(np.asarray(A.to_dense()),
                               [[0.0, 3.0], [5.0, 0.0]])


def test_scipy_target_format_and_kwargs(rng):
    m = _random_scipy(rng)
    E = from_scipy(m.tocsc(), cls=gt.Ell)
    assert isinstance(E, gt.Ell)
    np.testing.assert_allclose(np.asarray(E.to_dense()), m.toarray(),
                               rtol=1e-14)
    C = from_scipy(m, strategy="classical")
    assert C.strategy == "classical"


def test_scipy_rejects_dense():
    with pytest.raises(TypeError):
        from_scipy(np.eye(3))


def test_bcoo_roundtrip(rng):
    dense = np.where(rng.random((23, 23)) < 0.15,
                     rng.standard_normal((23, 23)), 0.0)
    bcoo = jsparse.BCOO.fromdense(jnp.asarray(dense))
    A = from_bcoo(bcoo)
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=1e-14)
    out = to_bcoo(A)
    assert isinstance(out, jsparse.BCOO)
    np.testing.assert_allclose(np.asarray(out.todense()), dense, rtol=1e-14)


def test_bcsr_roundtrip(rng):
    dense = np.where(rng.random((16, 24)) < 0.2,
                     rng.standard_normal((16, 24)), 0.0)
    bcsr = jsparse.BCSR.fromdense(jnp.asarray(dense))
    A = from_bcsr(bcsr)
    np.testing.assert_allclose(np.asarray(A.to_dense()), dense, rtol=1e-14)
    out = to_bcsr(A)
    assert isinstance(out, jsparse.BCSR)
    np.testing.assert_allclose(np.asarray(out.todense()), dense, rtol=1e-14)


def test_export_canonicalizes_unsorted_coo():
    """Coo stores entries in assembly order; exporters must not stamp
    indices_sorted/unique_indices (or build row_ptrs) on raw stored order
    (advisor round-3 finding)."""
    # deliberately unsorted + duplicated assembly order
    data = gt.MatrixData((3, 3),
                         np.array([2, 0, 1, 0, 2]),
                         np.array([1, 2, 0, 2, 0]),
                         np.array([4.0, 1.5, 2.0, 0.5, 3.0]))
    A = gt.Coo.from_data(data)
    dense = np.asarray(A.to_dense())

    out = to_bcoo(data)  # raw MatrixData path
    np.testing.assert_allclose(np.asarray(out.todense()), dense)
    idx = np.asarray(out.indices)
    keys = idx[:, 0] * 3 + idx[:, 1]
    assert np.all(keys[1:] > keys[:-1])  # sorted AND unique

    outc = to_bcsr(data)
    np.testing.assert_allclose(np.asarray(outc.todense()), dense)
    indptr = np.asarray(outc.indptr)
    assert indptr[-1] == outc.data.shape[0]
    # per-row column indices strictly increasing
    cols = np.asarray(outc.indices)
    for r in range(3):
        seg = cols[indptr[r]:indptr[r + 1]]
        assert np.all(seg[1:] > seg[:-1])


def test_bcoo_batched_rejected():
    batched = jsparse.BCOO.fromdense(jnp.ones((2, 3, 3)), n_batch=1)
    with pytest.raises(gt.NotSupportedError):
        from_bcoo(batched)


def test_solver_drive_from_scipy():
    """End-to-end: assemble in scipy, solve in ginkgo_tpu."""
    n = 64
    m = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n), format="csr")
    A = from_scipy(m)
    b = np.ones(n)
    solver = gt.solver.Cg.build(
        criteria=gt.stop.Iteration(200) | gt.stop.ResidualNorm(1e-10)
    ).generate(A)
    x = np.asarray(solver.apply(jnp.asarray(b)))
    np.testing.assert_allclose(m @ x, b, atol=1e-7)
