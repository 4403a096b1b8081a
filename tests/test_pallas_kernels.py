"""Backend-vs-reference kernel tests (SURVEY §4 tier 3): the Pallas TPU
kernels run in interpret mode on CPU against the jnp reference tier —
same data, same tolerances, mirroring test/ in the reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu.ops.spmv import dia_spmv
from ginkgo_tpu.ops.spmv_pallas import (block_diag_values, dia_spmv_pallas,
                                        plan_banded_layout,
                                        unblock_diag_values)


def _banded_setup(n, offsets, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    D = len(offsets)
    diag_values = rng.standard_normal((D, n)).astype(dtype)
    # zero out-of-range tails so dense oracle matches
    for d, off in enumerate(offsets):
        if off < 0:
            diag_values[d, :-off] = diag_values[d, :-off]  # rows < -off hit col<0
            diag_values[d, : -off][: max(0, -off)] = 0
            diag_values[d, :max(0, -off)] = 0
        elif off > 0:
            diag_values[d, n - off:] = 0
    meta = plan_banded_layout(tuple(offsets), n)
    dvb = jnp.asarray(block_diag_values(diag_values, meta))
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(dtype))
    return diag_values, meta, dvb, x


def _dense_oracle(diag_values, offsets, n, x):
    dense = np.zeros((n, n))
    for d, off in enumerate(offsets):
        for i in range(n):
            j = i + off
            if 0 <= j < n:
                dense[i, j] = diag_values[d, i]
    return dense @ np.asarray(x)


@pytest.mark.parametrize("n,offsets", [
    (1000, (-1, 0, 1)),
    (5000, (-130, -129, -128, -1, 0, 1, 128, 129, 130)),   # cross-sublane
    (3000, (-257, 0, 257)),                                # multi-sublane
    (2000, (0,)),
])
def test_dia_pallas_interpret_matches_reference(n, offsets):
    diag_values, meta, dvb, x = _banded_setup(n, offsets)
    ref = dia_spmv(tuple(offsets), dvb, meta, x)
    got = dia_spmv_pallas(tuple(offsets), dvb, meta, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    oracle = _dense_oracle(diag_values, offsets, n, x)
    np.testing.assert_allclose(np.asarray(got), oracle, rtol=1e-4,
                               atol=1e-4)


def test_block_unblock_roundtrip():
    rng = np.random.default_rng(1)
    n = 700
    offsets = (-2, 0, 3)
    dv = rng.standard_normal((3, n)).astype(np.float32)
    meta = plan_banded_layout(offsets, n)
    dvb = block_diag_values(dv, meta)
    back = np.asarray(unblock_diag_values(jnp.asarray(dvb), meta))
    np.testing.assert_allclose(back, dv, rtol=1e-6)


@pytest.mark.parametrize("k", [1, 2, 5, 8])
def test_dia_pallas_multi_rhs(k):
    n, offsets = 2000, (-129, -1, 0, 1, 129)
    diag_values, meta, dvb, _ = _banded_setup(n, offsets, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ref = dia_spmv(tuple(offsets), dvb, meta, x)
    got = dia_spmv_pallas(tuple(offsets), dvb, meta, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [9, 16, 19])
def test_dia_wide_rhs_chunks_stay_on_kernel_path(k):
    """k > _MAX_RHS goes through the column-chunked Pallas dispatch
    (dia_spmv_tpu), not the jnp fallback; results match the reference."""
    from ginkgo_tpu.ops import spmv_pallas

    n, offsets = 1500, (-40, -1, 0, 1, 40)
    diag_values, meta, dvb, _ = _banded_setup(n, offsets, seed=6)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ref = dia_spmv(tuple(offsets), dvb, meta, x)
    calls = []
    orig = spmv_pallas.dia_spmv_pallas
    try:
        def spy(offs, d, m, b, **kw):
            calls.append(b.shape[1])
            return orig(offs, d, m, b, interpret=True)
        spmv_pallas.dia_spmv_pallas = spy
        got = spmv_pallas.dia_spmv_tpu(tuple(offsets), dvb, meta, x)
    finally:
        spmv_pallas.dia_spmv_pallas = orig
    assert sum(calls) == k and max(calls) <= spmv_pallas._MAX_RHS
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sdtype", [jnp.bfloat16, jnp.float16], ids=str)
def test_dia_pallas_reduced_storage(sdtype):
    """Mixed-precision kernel: bf16/f16 diagonal storage, f32 vectors/math."""
    n, offsets = 2000, (-1, 0, 1)
    diag_values, meta, dvb, x = _banded_setup(n, offsets, seed=5)
    dvb16 = dvb.astype(sdtype)
    ref = dia_spmv(tuple(offsets), dvb, meta, x)
    got = dia_spmv_pallas(tuple(offsets), dvb16, meta, x, interpret=True)
    assert got.dtype == jnp.float32
    scale = float(jnp.abs(ref).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-2)


def _banded_setup_complex(n, offsets, seed=10):
    re, meta, dvb_re, _ = _banded_setup(n, offsets, seed=seed)
    im, _, dvb_im, _ = _banded_setup(n, offsets, seed=seed + 1)
    dvb_c = (dvb_re + 1j * dvb_im.astype(jnp.complex64)).astype(jnp.complex64)
    return re + 1j * im, meta, dvb_c


@pytest.mark.parametrize("k", [1, 3, 8])
def test_dia_pallas_complex_matches_reference(k):
    """c64 banded SpMV = two real-plane Pallas passes (VERDICT r3 missing
    #2; reference instantiates complex GPU SpMV directly,
    include/ginkgo/core/base/types.hpp:459-476)."""
    from ginkgo_tpu.ops.spmv_pallas import dia_spmv_complex

    n, offsets = 1500, (-129, -1, 0, 1, 129)
    diag_c, meta, dvb_c = _banded_setup_complex(n, offsets)
    rng = np.random.default_rng(11)
    x = jnp.asarray((rng.standard_normal((n, k))
                     + 1j * rng.standard_normal((n, k))).astype(np.complex64))
    ref = dia_spmv(tuple(offsets), dvb_c, meta, x)
    got = dia_spmv_complex(tuple(offsets), dvb_c, meta, x, interpret=True)
    assert got.dtype == jnp.complex64
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dia_pallas_complex_real_matrix():
    """Real banded matrix applied to a complex multivector: one plane pass."""
    from ginkgo_tpu.ops.spmv_pallas import dia_spmv_complex

    n, offsets = 1200, (-1, 0, 1)
    diag_values, meta, dvb, _ = _banded_setup(n, offsets, seed=12)
    rng = np.random.default_rng(13)
    x = jnp.asarray((rng.standard_normal((n, 2))
                     + 1j * rng.standard_normal((n, 2))).astype(np.complex64))
    ref = dia_spmv(tuple(offsets), dvb, meta, x)
    got = dia_spmv_complex(tuple(offsets), dvb, meta, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dia_tpu_router_promotes_real_b_on_complex_matrix():
    """complex matrix x real vector routes through the plane path with the
    vector promoted, not the gather fallback."""
    from ginkgo_tpu.ops import spmv_pallas

    n, offsets = 1000, (-1, 0, 1)
    _, meta, dvb_c = _banded_setup_complex(n, offsets, seed=20)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    ref = dia_spmv(tuple(offsets), dvb_c, meta, x.astype(jnp.complex64))
    calls = []
    orig = spmv_pallas.dia_spmv_pallas
    try:
        def spy(offs, d, m, b, **kw):
            calls.append(d.dtype)
            return orig(offs, d, m, b, interpret=True)
        spmv_pallas.dia_spmv_pallas = spy
        got = spmv_pallas.dia_spmv_tpu(tuple(offsets), dvb_c, meta, x)
    finally:
        spmv_pallas.dia_spmv_pallas = orig
    assert calls and all(d == jnp.float32 for d in calls)   # plane passes
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dia_c64_planes_public_api():
    """dia_spmv_c64_planes: planes in/out with NO complex dtype in the
    graph — the chip path on runtimes that cannot compile complex
    executables (axon tunnel), and the core dia_spmv_complex wraps."""
    from ginkgo_tpu.ops.spmv_pallas import (dia_spmv_c64_planes,
                                            dia_spmv_complex)

    n, offsets = 1500, (-129, -1, 0, 1, 129)
    diag_c, meta, dvb_c = _banded_setup_complex(n, offsets)
    rng = np.random.default_rng(30)
    x = (rng.standard_normal((n, 2))
         + 1j * rng.standard_normal((n, 2))).astype(np.complex64)
    ref = dia_spmv_complex(tuple(offsets), dvb_c, meta, jnp.asarray(x),
                           interpret=True)
    yr, yi = dia_spmv_c64_planes(
        tuple(offsets), jnp.real(dvb_c), jnp.imag(dvb_c), meta,
        jnp.asarray(x.real), jnp.asarray(x.imag), interpret=True)
    assert yr.dtype == jnp.float32 and yi.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)
    # real matrix: dvb_im=None takes the single-pass branch
    yr2, yi2 = dia_spmv_c64_planes(
        tuple(offsets), jnp.real(dvb_c), None, meta,
        jnp.asarray(x.real), jnp.asarray(x.imag), interpret=True)
    ref2 = dia_spmv_complex(tuple(offsets), jnp.real(dvb_c), meta,
                            jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(yr2) + 1j * np.asarray(yi2),
                               np.asarray(ref2), rtol=2e-5, atol=2e-5)
