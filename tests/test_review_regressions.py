"""Regression tests for the round-1 code-review findings."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ginkgo_tpu as gt
from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm


@pytest.mark.slow
def test_transpose_without_x64():
    """Csr.transpose / device canonicalize must work with x64 disabled
    (the default deployment config — previously OverflowError)."""
    code = """
import jax, numpy as np, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, %r)
import ginkgo_tpu as gt
from ginkgo_tpu.utils.generators import generate_random_matrix
data = generate_random_matrix(20, 15, nonzeros_per_row=(1, 5), seed=0)
A = gt.Csr.from_data(data, dtype=np.float32)
T = A.transpose()
np.testing.assert_allclose(np.asarray(T.to_dense()),
                           data.to_dense().T.astype(np.float32), rtol=1e-6)
# conj_transpose + BiCG setup path
from ginkgo_tpu.solver import Bicg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import make_spd
spd = make_spd(generate_random_matrix(12, 12, nonzeros_per_row=(1, 4),
                                      seed=1), shift=2.0)
As = gt.Csr.from_data(spd, dtype=np.float32)
r = Bicg.solve(As, jnp.ones(12, jnp.float32),
               criteria=Iteration(200) | ResidualNorm(1e-4))
assert bool(r.converged.all())
# device canonicalization
from ginkgo_tpu.matrix.coo import Coo
from ginkgo_tpu.ops.device_matrix_data import canonicalize_device
coo = gt.Coo.from_data(data, dtype=np.float32)
out = jax.jit(canonicalize_device)(coo)
np.testing.assert_allclose(np.asarray(out.to_dense()),
                           data.canonical().to_dense().astype(np.float32),
                           rtol=1e-6)
print('OK')
"""
    import pathlib
    repo = str(pathlib.Path(__file__).parent.parent)
    res = subprocess.run([sys.executable, "-c", code % repo],
                         capture_output=True, text=True, timeout=300)
    assert "OK" in res.stdout, res.stderr[-2000:]


@pytest.mark.slow
def test_autodiff_banded_tail_gradient():
    """Gradients flow to tail_vals and on-band diag slots correctly."""
    from ginkgo_tpu.autodiff import make_differentiable_solve
    from ginkgo_tpu.solver import cg
    n = 48
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], i[1:], [0, 40]])
    cols = np.concatenate([i, i[1:], i[:-1], [40, 0]])
    vals = np.concatenate([np.full(n, 4.0), -np.ones(n - 1),
                           -np.ones(n - 1), [-0.5, -0.5]])
    data = MatrixData((n, n), rows, cols, vals)
    A = gt.Csr.from_data(data)
    assert A.strategy == "banded" and A.tail_rows is not None
    crit = Iteration(2000) | ResidualNorm(1e-13)
    solve = make_differentiable_solve(cg.solve, criteria=crit)
    b = jnp.ones(n)

    grads = jax.grad(lambda A: jnp.sum(solve(A, b) ** 2),
                     allow_int=True)(A)
    # dense oracle via finite differences on the two tail entries
    def loss_dense(dense):
        x = np.linalg.solve(dense, np.ones(n))
        return float((x ** 2).sum())

    dense0 = data.to_dense()
    eps = 1e-6
    tr = np.asarray(A.tail_rows)
    tc = np.asarray(A.tail_cols)
    tg = np.asarray(grads.tail_vals)
    checked = 0
    for t in range(len(tr)):
        if tr[t] >= n:
            assert tg[t] == 0
            continue
        dp = dense0.copy()
        dp[tr[t], tc[t]] += eps
        dm = dense0.copy()
        dm[tr[t], tc[t]] -= eps
        fd = (loss_dense(dp) - loss_dense(dm)) / (2 * eps)
        np.testing.assert_allclose(tg[t], fd, rtol=1e-3, atol=1e-9)
        checked += 1
    assert checked == 2
    # on-band gradient also correct (spot check one diag slot via fd on
    # the (0, 0) entry)
    dp = dense0.copy(); dp[0, 0] += eps
    dm = dense0.copy(); dm[0, 0] -= eps
    fd = (loss_dense(dp) - loss_dense(dm)) / (2 * eps)
    from ginkgo_tpu.ops.spmv_pallas import unblock_diag_values
    flat = np.asarray(unblock_diag_values(grads.diag_values,
                                          dict(A.band_meta)))
    d0 = list(A.diag_offsets).index(0)
    np.testing.assert_allclose(flat[d0, 0], fd, rtol=1e-3)


def test_batch_ell_pattern_mismatch_raises():
    from ginkgo_tpu.batch import BatchEll
    a = MatrixData((2, 2), [0, 1], [0, 1], [1.0, 2.0])
    b = MatrixData((2, 2), [0, 1], [0, 1], [0.0, 3.0])  # zero drops
    with pytest.raises(ValueError):
        BatchEll.from_data([a, b])


def test_block_jacobi_zero_row_guard():
    from ginkgo_tpu.preconditioner.jacobi import Jacobi
    dense = np.diag([2.0, 0.0, 3.0, 4.0])
    dense[1, :] = 0.0
    A = gt.Csr.from_dense(dense)
    M = Jacobi(max_block_size=2).generate(A)
    y = np.asarray(M.apply(jnp.ones(4)))
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, [0.5, 1.0, 1 / 3, 0.25])


def test_binary_io_roundtrip_bare_path(tmp_path):
    data = MatrixData((3, 3), [0, 1], [1, 2], [5.0, 6.0])
    path = str(tmp_path / "mat_no_suffix")
    gt.write_binary(path, data)
    back = gt.read_binary(path)
    np.testing.assert_allclose(back.to_dense(), data.to_dense())
    from ginkgo_tpu.utils.checkpoint import load, save
    cpath = str(tmp_path / "ck_no_suffix")
    save(cpath, gt.Csr.from_data(data))
    B = load(cpath)
    np.testing.assert_allclose(np.asarray(B.to_dense()), data.to_dense())


def test_fft_true_adjoint():
    n = 8
    F = gt.Fft(size=n)
    dense = np.asarray(F.apply(jnp.eye(n)))          # DFT matrix (n, n)
    adj = np.asarray(F.conj_transpose().apply(jnp.eye(n)))
    np.testing.assert_allclose(adj, dense.conj().T, rtol=1e-10, atol=1e-10)
    F2 = gt.Fft2(4, 2)
    d2 = np.asarray(F2.apply(jnp.eye(8)))
    a2 = np.asarray(F2.conj_transpose().apply(jnp.eye(8)))
    np.testing.assert_allclose(a2, d2.conj().T, rtol=1e-10, atol=1e-10)
    # double adjoint is identity-consistent
    a3 = np.asarray(F.conj_transpose().conj_transpose().apply(jnp.eye(n)))
    np.testing.assert_allclose(a3, dense, rtol=1e-10, atol=1e-10)


def test_empty_criteria_rejected():
    A = gt.Csr.from_dense(np.eye(3))
    with pytest.raises(ValueError):
        Cg.solve(A, jnp.ones(3), criteria=[])
    from ginkgo_tpu.stop.criterion import Combined
    with pytest.raises(ValueError):
        Cg.solve(A, jnp.ones(3), criteria=Combined(criteria=()))


def test_batch_item_row_ptr_consistent():
    from ginkgo_tpu.batch import BatchCsr
    from ginkgo_tpu.utils.generators import generate_random_matrix
    data = generate_random_matrix(10, 10, nonzeros_per_row=(1, 4), seed=3)
    d = data.canonical()
    A = BatchCsr.from_data((d, d.values[None, :]))
    item = A.item(A.values[0])
    np.testing.assert_array_equal(np.asarray(item.row_lengths()),
                                  np.diff(d.row_ptrs()))


def test_cholesky_uses_sparse_updates():
    """Left-looking Cholesky cost tracks nnz: a large tridiagonal finishes
    fast (was O(n^2) dict probes)."""
    import time
    n = 3000
    i = np.arange(n)
    rows = np.concatenate([i, i[1:]])
    cols = np.concatenate([i, i[:-1]])
    vals = np.concatenate([np.full(n, 4.0), -np.ones(n - 1)])
    sym = MatrixData((n, n), np.concatenate([rows, cols]),
                     np.concatenate([cols, rows]),
                     np.concatenate([vals, vals])).canonical()
    from ginkgo_tpu.factorization.direct import Cholesky
    t0 = time.perf_counter()
    f = Cholesky().generate(gt.Csr.from_data(sym))
    assert time.perf_counter() - t0 < 20.0
    L = np.asarray(f.l_factor.to_dense())
    np.testing.assert_allclose(L @ L.T, sym.to_dense(), rtol=1e-10,
                               atol=1e-10)
