"""Double-word f32 ("df64") arithmetic: error-free transforms, the
compensated reductions, the df64 banded SpMV, and mixed-precision IR
reaching fp64-level residuals from f32 storage (SURVEY §7(e) — the
reference's fp64 configs, types.hpp:459-476, on f64-less TPU hardware).

These tests force f32 inputs and compare against numpy float64 oracles,
so they validate exactly what the real chip (no native f64) would do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu.ops import df64 as D


def _f32(rng, n, scale=1.0):
    return (rng.standard_normal(n) * scale).astype(np.float32)


def test_two_sum_two_prod_error_free():
    rng = np.random.default_rng(0)
    a = jnp.asarray(_f32(rng, 1000))
    b = jnp.asarray(_f32(rng, 1000, 1e-4))
    s, e = D.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)
    p, e2 = D.two_prod(a, b)
    exactp = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    gotp = np.asarray(p, np.float64) + np.asarray(e2, np.float64)
    np.testing.assert_array_equal(gotp, exactp)


def test_df64_dot_matches_f64():
    rng = np.random.default_rng(1)
    n = 1 << 16
    # adversarial: large cancellation (plain f32 loses ~all digits)
    x = np.concatenate([_f32(rng, n // 2, 1e4),
                        -_f32(rng, n // 2, 1e4)]).astype(np.float32)
    y = np.ones(n, np.float32)
    x64 = x.astype(np.float64)
    exact = float(x64 @ y.astype(np.float64))
    naive = float(jnp.dot(jnp.asarray(x), jnp.asarray(y)))
    h, l_ = jax.jit(D.df64_dot)(jnp.asarray(x), jnp.asarray(y))
    got = float(np.asarray(h, np.float64) + np.asarray(l_, np.float64))
    scale = float(np.abs(x64).sum())
    assert abs(got - exact) / scale < 1e-13
    # sanity: the compensation beats naive f32 by orders of magnitude
    assert (abs(got - exact) < 1e-4 * abs(naive - exact)
            or abs(naive - exact) < 1e-12 * scale)


def test_df64_norm_and_df_ops():
    rng = np.random.default_rng(2)
    x = _f32(rng, 4097, 3.0)
    exact = float(np.linalg.norm(x.astype(np.float64)))
    nh, nl = D.df64_norm2(jnp.asarray(x))
    got = float(np.float64(nh) + np.float64(nl))
    assert abs(got - exact) / exact < 1e-12
    # df arithmetic round-trip: (a+b)*(c) / c - a == b to ~2^-48
    ah, al = D.quick_two_sum(jnp.float32(1.0), jnp.float32(3e-8))
    mh, ml = D.df_mul_f32(ah, al, jnp.float32(7.0))
    qh, ql = D.df_div(mh, ml, jnp.float32(7.0), jnp.float32(0.0))
    val = (np.float64(qh) + np.float64(ql)) - 1.0
    assert abs(val - 3e-8) < 1e-14


def test_dia_spmv_df64_matches_f64():
    rng = np.random.default_rng(3)
    n = 5000
    offsets = (-64, -1, 0, 1, 64)
    dv = np.zeros((len(offsets), n), np.float32)
    for d, k in enumerate(offsets):
        lo, hi = max(0, -k), min(n, n - k)
        dv[d, lo:hi] = _f32(rng, hi - lo, 2.0)
    xh = _f32(rng, n)
    xl = (rng.standard_normal(n) * 1e-8).astype(np.float32)
    # f64 oracle
    import scipy.sparse as sp
    rows, cols, vals = [], [], []
    for d, k in enumerate(offsets):
        i = np.arange(max(0, -k), min(n, n - k))
        rows.append(i)
        cols.append(i + k)
        vals.append(dv[d, i].astype(np.float64))
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    exact = A @ (xh.astype(np.float64) + xl.astype(np.float64))
    yh, yl = jax.jit(D.dia_spmv_df64, static_argnums=(0, 2))(
        offsets, jnp.asarray(dv), n, jnp.asarray(xh), jnp.asarray(xl))
    got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    scale = np.abs(A).max() * np.abs(xh).max() * len(offsets)
    assert np.abs(got - exact).max() / scale < 1e-13


def _cg_inner(A, r):
    from ginkgo_tpu.solver import Cg
    from ginkgo_tpu.stop import Iteration, ResidualNorm
    res = Cg.solve(A, r, criteria=[Iteration(200),
                                   ResidualNorm(1e-6)])
    return res.x.reshape(-1)


def test_ir_df64_reaches_fp64_residual():
    """f32 CG + df64-residual IR drives the Poisson residual to the
    df64 floor (~1e-12 relative) — the on-chip equivalent of the
    reference's fp64 baseline config."""
    from ginkgo_tpu.matrix.csr import Csr
    from ginkgo_tpu.utils.generators import stencil_3d
    data = stencil_3d(16, points=7)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    b = jnp.ones(n, jnp.float32)
    (xh, xl), hist = D.ir_df64(A, b, _cg_inner, iterations=4)
    # f64 oracle residual of the df64 iterate
    import scipy.sparse as sp
    d = data.canonical()
    S = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)), shape=(n, n))
    x64 = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
    rel = np.linalg.norm(np.ones(n) - S @ x64) / np.sqrt(n)
    assert rel < 5e-11, rel
    # and a plain single f32 solve cannot reach that floor
    x32 = np.asarray(_cg_inner(A, b), np.float64)
    rel32 = np.linalg.norm(np.ones(n) - S @ x32) / np.sqrt(n)
    assert rel < 1e-3 * max(rel32, 1e-30)


def test_pell_spmv_df64_matches_f64_on_fem_pattern():
    """Packed-layout df64 SpMV (VERDICT r2 task 8): full df64
    accumulation over the slot axes must track the f64 oracle to the
    df64 floor on an unstructured FEM-like pattern."""
    from ginkgo_tpu import Csr
    from ginkgo_tpu.base.matrix_data import MatrixData

    rng = np.random.default_rng(3)
    n, n_off, spread = 1024, 24, 500
    offs = rng.integers(-spread, spread, (-(-n // 128), n_off))
    pick = rng.random((n, n_off)) < 0.6
    r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
    c = np.clip(r + offs[np.arange(n) // 128], 0, n - 1)
    key = np.unique(r[pick] * n + c[pick])
    data = MatrixData((n, n), (key // n).astype(np.int64),
                      (key % n).astype(np.int64),
                      rng.standard_normal(key.size))
    A = Csr.from_data(data, dtype=np.float32, strategy="packed")
    assert A.strategy == "packed"
    x64 = rng.standard_normal(n)
    xh = jnp.asarray(x64, jnp.float32)
    xl = jnp.asarray(x64 - np.asarray(xh, np.float64), jnp.float32)
    yh, yl = jax.jit(lambda A, h, l_: D.pell_spmv_df64(
        A.pell_vals, A.pell_idx, A.pell_qw, A.pell_xbase, A.pell_meta,
        h, l_))(A, xh, xl)
    if A.tail_rows is not None:
        th, tl = D.csr_spmv_df64(A.tail_rows, A.tail_cols,
                                 A.tail_vals.astype(jnp.float32), n,
                                 xh, xl)
        yh, yl = D.df_add(yh, yl, th, tl)
    # f64 oracle with the SAME f32-rounded matrix values
    vals64 = np.zeros((n, n))
    d = data.canonical()
    vals64[d.row_idx, d.col_idx] = d.values.astype(np.float32)
    oracle = vals64 @ x64
    got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    scale = np.abs(oracle).max() + 1
    assert np.abs(got - oracle).max() / scale < 1e-12


@pytest.mark.slow
def test_df64_dot_dist_matches_f64():
    """Compensated distributed dot: per-shard dot2 + psum of (hi, lo)
    reaches fp64 accuracy over an 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    rng = np.random.default_rng(7)
    n = 4096
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("rows",))
    sh = NamedSharding(mesh, PartitionSpec("rows"))
    xd = jax.device_put(jnp.asarray(x), sh)
    yd = jax.device_put(jnp.asarray(y), sh)
    h, l_ = D.df64_dot_dist(xd, yd, mesh)
    got = float(np.asarray(h, np.float64) + np.asarray(l_, np.float64))
    want = float(np.dot(x.astype(np.float64), y.astype(np.float64)))
    assert abs(got - want) / (abs(want) + 1) < 1e-10
    # plain f32 dot is measurably worse on this size
    naive = float(jnp.dot(xd, yd))
    assert abs(got - want) <= abs(naive - want) + 1e-12
