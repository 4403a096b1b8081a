"""LinOp mixin-surface parity tests.

Covers the remaining small mixin APIs from the reference inventory
(SURVEY.md §2.1-2.2): ScaledIdentityAddable (``lin_op.hpp:818``),
AbsoluteComputable (``dense.hpp:816``, ``csr.hpp:1192``), complex
part extraction (``dense.hpp:820+``), squared norms, inv/sub scaling,
Csr column-sortedness queries (``csr.hpp:1199-1207``), and the batch
format add_scaled_identity (``batch_csr.hpp:380`` et al.).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.batch import BatchCsr, BatchDense, BatchEll, BatchMultiVector
from ginkgo_tpu.matrix.csr import Csr
from ginkgo_tpu.matrix.dense import Dense


def _rand_dense(n, m, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, m)).astype(dtype)


class TestDenseMixins:
    def test_add_scaled_identity(self):
        a = _rand_dense(5, 5)
        d = Dense.create(a)
        out = d.add_scaled_identity(2.5, -0.5)
        np.testing.assert_allclose(np.asarray(out.data),
                                   -0.5 * a + 2.5 * np.eye(5), rtol=1e-14)

    def test_add_scaled_identity_rectangular(self):
        a = _rand_dense(4, 6)
        out = Dense.create(a).add_scaled_identity(1.0, 1.0)
        np.testing.assert_allclose(np.asarray(out.data),
                                   a + np.eye(4, 6), rtol=1e-14)

    def test_absolute_and_squared_norm(self):
        a = _rand_dense(7, 3)
        d = Dense.create(a)
        np.testing.assert_allclose(np.asarray(d.compute_absolute().data),
                                   np.abs(a), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(d.compute_squared_norm2()),
                                   np.sum(a * a, axis=0), rtol=1e-12)

    def test_complex_parts(self):
        a = _rand_dense(4, 2) + 1j * _rand_dense(4, 2, seed=1)
        d = Dense.create(a.astype(np.complex128))
        np.testing.assert_allclose(np.asarray(d.get_real().data), a.real)
        np.testing.assert_allclose(np.asarray(d.get_imag().data), a.imag)
        c = Dense.create(a.real).make_complex()
        assert jnp.iscomplexobj(c.data)
        np.testing.assert_allclose(np.asarray(c.data), a.real)

    def test_inv_scale_sub_scaled(self):
        a = _rand_dense(5, 2)
        b = _rand_dense(5, 2, seed=2)
        d = Dense.create(a)
        np.testing.assert_allclose(np.asarray(d.inv_scale(4.0).data), a / 4.0)
        np.testing.assert_allclose(
            np.asarray(d.sub_scaled(0.75, Dense.create(b)).data),
            a - 0.75 * b, rtol=1e-14)


def _poisson_data(n):
    rows, cols, vals = [], [], []
    for i in range(n):
        rows.append(i); cols.append(i); vals.append(2.0)
        if i > 0:
            rows.append(i); cols.append(i - 1); vals.append(-1.0)
        if i < n - 1:
            rows.append(i); cols.append(i + 1); vals.append(-1.0)
    return MatrixData((n, n), np.array(rows), np.array(cols),
                      np.array(vals, np.float64))


class TestCsrMixins:
    def test_add_scaled_identity_classical(self):
        d = _poisson_data(8)
        A = Csr.from_data(d, strategy="classical")
        out = A.add_scaled_identity(3.0, 2.0)
        expect = 2.0 * np.asarray(A.to_dense()) + 3.0 * np.eye(8)
        np.testing.assert_allclose(np.asarray(out.to_dense()), expect,
                                   rtol=1e-14)

    def test_add_scaled_identity_banded(self):
        d = _poisson_data(64)
        A = Csr.from_data(d, strategy="banded")
        assert A.strategy == "banded"
        out = A.add_scaled_identity(-1.5, 0.5)
        expect = 0.5 * np.asarray(A.to_dense()) - 1.5 * np.eye(64)
        np.testing.assert_allclose(np.asarray(out.to_dense()), expect,
                                   rtol=1e-14)
        # result keeps a fast layout and still applies correctly
        x = _rand_dense(64, 2)
        np.testing.assert_allclose(np.asarray(out.apply(x)), expect @ x,
                                   rtol=1e-12)

    def test_add_scaled_identity_missing_diagonal_raises(self):
        d = MatrixData((3, 3), np.array([0, 1, 2]), np.array([1, 1, 2]),
                       np.array([1.0, 2.0, 3.0]))
        A = Csr.from_data(d)
        with pytest.raises(ValueError, match="diagonal"):
            A.add_scaled_identity(1.0, 1.0)

    def test_add_scaled_identity_under_jit(self):
        d = _poisson_data(8)
        A = Csr.from_data(d, strategy="classical")

        @jax.jit
        def shift(A, mu):
            return A.add_scaled_identity(mu, 1.0).apply(
                jnp.ones((8, 1), A.values.dtype))

        got = shift(A, 0.5)
        expect = (np.asarray(A.to_dense()) + 0.5 * np.eye(8)) @ np.ones((8, 1))
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-14)

    def test_inv_scale_absolute(self):
        d = _poisson_data(8)
        A = Csr.from_data(d)
        np.testing.assert_allclose(np.asarray(A.inv_scale(2.0).to_dense()),
                                   np.asarray(A.to_dense()) / 2.0)
        np.testing.assert_allclose(
            np.asarray(A.compute_absolute().to_dense()),
            np.abs(np.asarray(A.to_dense())))

    def test_sortedness(self):
        A = Csr.from_data(_poisson_data(6))
        assert A.is_sorted_by_column_index()
        B = A.sort_by_column_index()
        np.testing.assert_allclose(np.asarray(B.to_dense()),
                                   np.asarray(A.to_dense()))


class TestReviewRegressions:
    def test_banded_add_scaled_identity_preserves_pattern(self):
        # a shift that makes one stored entry exactly zero must not shrink
        # the structural pattern (reference semantics: values change only)
        d = _poisson_data(64)
        A = Csr.from_data(d, strategy="banded")
        assert A.strategy == "banded"
        out = A.add_scaled_identity(-2.0, 1.0)   # diagonal 2.0 -> 0.0
        assert out.nnz == A.nnz
        # and it can be shifted again (diagonal still structurally present)
        back = out.add_scaled_identity(2.0, 1.0)
        np.testing.assert_allclose(np.asarray(back.to_dense()),
                                   np.asarray(A.to_dense()), rtol=1e-14)

    def test_add_scaled_identity_beta_zero_keeps_offdiagonals(self):
        d = _poisson_data(32)
        A = Csr.from_data(d, strategy="banded")
        out = A.add_scaled_identity(1.0, 0.0)    # beta=0 zeroes off-diags
        assert out.nnz == A.nnz
        np.testing.assert_allclose(np.asarray(out.to_dense()), np.eye(32))

    def test_banded_tracer_scalar_raises_cleanly(self):
        A = Csr.from_data(_poisson_data(64), strategy="banded")
        assert A.strategy == "banded"
        with pytest.raises(ValueError, match="build-time"):
            jax.jit(lambda mu: A.add_scaled_identity(mu, 1.0).values)(0.5)

    def test_sort_by_column_index_pure_reorder(self):
        # directly assembled arrays with an explicit zero and unsorted cols
        rows = jnp.asarray([0, 0, 1], jnp.int32)
        cols = jnp.asarray([1, 0, 1], jnp.int32)
        vals = jnp.asarray([5.0, 0.0, 2.0])
        A = Csr(row_ptr=jnp.asarray([0, 2, 3], jnp.int32), col_idx=cols,
                values=vals, row_idx=rows, shape=(2, 2), nnz=3,
                strategy="classical")
        assert not A.is_sorted_by_column_index()
        B = A.sort_by_column_index()
        assert B.nnz == 3                       # explicit zero kept
        assert B.is_sorted_by_column_index()
        np.testing.assert_allclose(np.asarray(B.values), [0.0, 5.0, 2.0])

    def test_composition_has_no_compute_absolute(self):
        from ginkgo_tpu.base.composition import Composition
        A = Csr.from_data(_poisson_data(4))
        with pytest.raises(AttributeError):
            Composition(ops=(A, A)).compute_absolute()


class TestAbsoluteAndDiagonal:
    def test_generic_compute_absolute_all_formats(self):
        rng = np.random.default_rng(5)
        dense = rng.standard_normal((12, 12))
        dense[np.abs(dense) < 0.8] = 0.0
        np.fill_diagonal(dense, 1.0)
        data = MatrixData.from_dense(dense)
        from ginkgo_tpu.matrix.coo import Coo
        from ginkgo_tpu.matrix.ell import Ell
        from ginkgo_tpu.matrix.fbcsr import Fbcsr
        from ginkgo_tpu.matrix.hybrid import Hybrid
        from ginkgo_tpu.matrix.sellp import Sellp
        for fmt in (Coo, Ell, Sellp, Hybrid, Fbcsr):
            A = fmt.from_data(data)
            np.testing.assert_allclose(
                np.asarray(A.compute_absolute().to_dense()), np.abs(dense),
                rtol=1e-14, err_msg=fmt.__name__)

    def test_diagonal_rapply_absolute(self):
        from ginkgo_tpu.matrix.diagonal import Diagonal
        d = Diagonal(values=jnp.asarray([1.0, -2.0, 4.0]))
        b = np.arange(6.0).reshape(2, 3)
        np.testing.assert_allclose(np.asarray(d.rapply(jnp.asarray(b))),
                                   b * np.array([1.0, -2.0, 4.0]))
        np.testing.assert_allclose(
            np.asarray(d.compute_absolute().values), [1.0, 2.0, 4.0])


class TestScalePermute:
    def _setup(self, n=7, seed=11):
        rng = np.random.default_rng(seed)
        dense = rng.standard_normal((n, n))
        dense[np.abs(dense) < 0.5] = 0.0
        np.fill_diagonal(dense, 2.0)
        from ginkgo_tpu.matrix.permutation import ScaledPermutation
        perm = rng.permutation(n)
        scale = rng.uniform(0.5, 2.0, n)
        sp = ScaledPermutation.from_indices(perm, scale)
        return dense, sp, np.asarray(sp.to_dense())

    @pytest.mark.parametrize("mode_name", ["rows", "columns", "symmetric",
                                           "inverse_symmetric"])
    def test_csr_scale_permute_modes(self, mode_name):
        from ginkgo_tpu.matrix.permutation import permute_mode
        dense, sp, S = self._setup()
        mode = {"rows": permute_mode.rows, "columns": permute_mode.columns,
                "symmetric": permute_mode.symmetric,
                "inverse_symmetric": (permute_mode.symmetric
                                      | permute_mode.inverse)}[mode_name]
        A = Csr.from_dense(dense)
        got = np.asarray(A.scale_permute(sp, mode=mode).to_dense())
        Sinv = np.linalg.inv(S)
        want = {"rows": S @ dense, "columns": dense @ S.T,
                "symmetric": S @ dense @ S.T,
                "inverse_symmetric": Sinv @ dense @ Sinv.T}[mode_name]
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_nonsymmetric_pair_and_invert(self):
        dense, rsp, Sr = self._setup(seed=21)
        _, csp, Sc = self._setup(seed=22)
        A = Csr.from_dense(dense)
        got = np.asarray(A.scale_permute(rsp, col_sp=csp).to_dense())
        np.testing.assert_allclose(got, Sr @ dense @ Sc.T, rtol=1e-12)
        got = np.asarray(
            A.scale_permute(rsp, col_sp=csp, invert=True).to_dense())
        np.testing.assert_allclose(
            got, np.linalg.inv(Sr) @ dense @ np.linalg.inv(Sc).T, rtol=1e-11)

    def test_dense_scale_permute_matches_csr(self):
        from ginkgo_tpu.matrix.permutation import permute_mode
        dense, sp, S = self._setup(seed=31)
        D = Dense.create(dense)
        got = np.asarray(
            D.scale_permute(sp, mode=permute_mode.symmetric).to_dense())
        np.testing.assert_allclose(got, S @ dense @ S.T, rtol=1e-12)

    def test_invert_kwarg_one_permutation_form(self):
        # invert=True without col_sp must invert (was silently ignored)
        dense, sp, S = self._setup(seed=51)
        A = Csr.from_dense(dense)
        got = np.asarray(A.scale_permute(sp, invert=True).to_dense())
        Sinv = np.linalg.inv(S)
        np.testing.assert_allclose(got, Sinv @ dense @ Sinv.T, rtol=1e-11)

    def test_mode_with_col_sp_raises(self):
        from ginkgo_tpu.matrix.permutation import permute_mode
        dense, rsp, _ = self._setup(seed=52)
        _, csp, _ = self._setup(seed=53)
        A = Csr.from_dense(dense)
        with pytest.raises(ValueError, match="not both"):
            A.scale_permute(rsp, mode=permute_mode.rows, col_sp=csp)

    def test_dense_permute_honors_inverse(self):
        from ginkgo_tpu.matrix.permutation import permute_mode
        dense, sp, _ = self._setup(seed=54)
        perm = np.asarray(sp.perm)
        D = Dense.create(dense)
        A = Csr.from_dense(dense)
        for mode in (permute_mode.inverse_rows, permute_mode.inverse_columns,
                     permute_mode.inverse_symmetric):
            np.testing.assert_allclose(
                np.asarray(D.permute(perm, mode).to_dense()),
                np.asarray(A.permute(perm, mode).to_dense()),
                rtol=1e-13, err_msg=str(mode))

    def test_dense_scale_permute_preserves_nan(self):
        from ginkgo_tpu.matrix.permutation import permute_mode
        dense, sp, S = self._setup(seed=55)
        dense = dense.copy()
        dense[1, 2] = np.nan
        got = np.asarray(Dense.create(dense).scale_permute(
            sp, mode=permute_mode.rows).to_dense())
        # gather-based oracle: s[i]*A(p[i], :) — a dense S @ A matmul would
        # smear the NaN over the whole column via 0*NaN
        want = np.asarray(sp.scale)[:, None] * dense[np.asarray(sp.perm)]
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(got[~np.isnan(want)], want[~np.isnan(want)],
                                   rtol=1e-12)

    def test_symmetric_roundtrip(self):
        from ginkgo_tpu.matrix.permutation import permute_mode
        dense, sp, S = self._setup(seed=41)
        A = Csr.from_dense(dense)
        back = A.scale_permute(sp, mode=permute_mode.symmetric).scale_permute(
            sp, mode=permute_mode.symmetric | permute_mode.inverse)
        np.testing.assert_allclose(np.asarray(back.to_dense()), dense,
                                   rtol=1e-11, atol=1e-12)


class TestBatchAddScaledIdentity:
    def _batch_data(self, nb, n, seed=0):
        rng = np.random.default_rng(seed)
        pattern = _poisson_data(n)
        vals = rng.standard_normal((nb, pattern.nnz))
        # keep the shared pattern; per-entry values
        items = [MatrixData((n, n), pattern.row_idx, pattern.col_idx, v)
                 for v in vals]
        return items

    def test_batch_csr(self):
        items = self._batch_data(3, 6)
        B = BatchCsr.from_data(items)
        alpha = np.array([1.0, -2.0, 0.5])
        out = B.add_scaled_identity(alpha, 2.0)
        dense = np.asarray(B.to_dense_batch())
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(out.to_dense_batch())[i],
                2.0 * dense[i] + alpha[i] * np.eye(6), rtol=1e-14)

    def test_batch_csr_multivector_scalars(self):
        items = self._batch_data(2, 4, seed=3)
        B = BatchCsr.from_data(items)
        alpha = BatchMultiVector(data=jnp.asarray([[[1.5]], [[-0.5]]]))
        out = B.add_scaled_identity(alpha, 1.0)
        dense = np.asarray(B.to_dense_batch())
        for i, a in enumerate([1.5, -0.5]):
            np.testing.assert_allclose(
                np.asarray(out.to_dense_batch())[i],
                dense[i] + a * np.eye(4), rtol=1e-14)

    def test_batch_dense(self):
        rng = np.random.default_rng(1)
        data = rng.standard_normal((3, 5, 5))
        B = BatchDense(data=jnp.asarray(data))
        out = B.add_scaled_identity(2.0, np.array([1.0, 0.0, -1.0]))
        for i, b in enumerate([1.0, 0.0, -1.0]):
            np.testing.assert_allclose(np.asarray(out.data)[i],
                                       b * data[i] + 2.0 * np.eye(5),
                                       rtol=1e-14)

    def test_batch_ell(self):
        items = self._batch_data(2, 5, seed=7)
        B = BatchEll.from_data(items)
        out = B.add_scaled_identity(1.25, 1.0)
        for i in range(2):
            expect = (np.asarray(B.item(B.values[i]).to_dense())
                      + 1.25 * np.eye(5))
            np.testing.assert_allclose(
                np.asarray(out.item(out.values[i]).to_dense()), expect,
                rtol=1e-14)

    def test_batch_csr_missing_diag_raises(self):
        d = MatrixData((3, 3), np.array([0, 1, 2]), np.array([1, 1, 2]),
                       np.array([1.0, 2.0, 3.0]))
        B = BatchCsr.from_data([d, d])
        with pytest.raises(ValueError, match="diagonal"):
            B.add_scaled_identity(1.0, 1.0)
