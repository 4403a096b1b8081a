"""On-chip acceptance measurements for the round-4 device paths.

Sections (pass names as argv, default all):
  c64spmv  — complex banded SpMV GB/s (re/im plane kernel,
             ops/spmv_pallas.dia_spmv_complex) at n=262k 27-pt.
  c64solver — complex BiCGSTAB chip-verified on a shifted Poisson system.
  trisolve — exact block-partitioned-inverse trisolve (ops/tri_banded.py)
             per-apply cost vs the level/jacobi paths + IC(0)-CG totals.
  parilut  — packed device ParILUT at n=262k unstructured banded pattern
             (factorization/par_ilut_packed.py): plan time + device loop
             time, 5 iterations fill 2x.

Chain-depth differencing per CLAUDE.md (~25 ms dispatch tunnel overhead).
Run: python tools/measure_round4.py [section ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _stencil(nside=64, points=27):
    from ginkgo_tpu.utils.generators import stencil_3d
    return stencil_3d(nside, points=points)


def _c64_banded_planes(nside=64, points=27):
    """Complex banded matrix as two f32 Csr plane operators sharing one
    banded plan (the axon tunnel cannot compile complex executables, so
    the chip path is the planes API, dia_spmv_c64_planes)."""
    from ginkgo_tpu import Csr
    from ginkgo_tpu.base.matrix_data import MatrixData
    data = _stencil(nside, points)
    phase = np.exp(1j * 0.3 * (data.row_idx % 7))
    cvals = (data.values * phase).astype(np.complex64)
    dre = MatrixData(data.shape, data.row_idx, data.col_idx,
                     cvals.real.astype(np.float32))
    dim = MatrixData(data.shape, data.row_idx, data.col_idx,
                     cvals.imag.astype(np.float32))
    Are = Csr.from_data(dre, dtype=np.float32, strategy="automatical")
    Aim = Csr.from_data(dim, dtype=np.float32, strategy="automatical")
    assert Are.strategy == "banded" and Aim.strategy == "banded"
    return Are, Aim, cvals, data


def c64spmv():
    from ginkgo_tpu.benchmark.runner import chain_k_for_backend, time_chained
    from ginkgo_tpu.ops.spmv_pallas import dia_spmv_c64_planes
    Are, Aim, cvals, data = _c64_banded_planes()
    n = data.shape[0]
    meta = dict(Are.band_meta)
    offs = Are.diag_offsets
    xr = jnp.ones((n, 1), jnp.float32)
    xi = jnp.full((n, 1), 0.5, jnp.float32)

    def make_chain(K):
        @jax.jit
        def chain(vre, vim, xr, xi):
            def body(_, c):
                yr, yi = dia_spmv_c64_planes(offs, vre, vim, meta,
                                             c[0], c[1])
                return yr / 16.0, yi / 16.0
            yr, yi = jax.lax.fori_loop(0, K, body, (xr, xi))
            return yr.sum() + yi.sum()
        return chain

    k1, k2 = chain_k_for_backend()
    t = time_chained(make_chain,
                     (Are.diag_values, Aim.diag_values, xr, xi), k1, k2)
    sb = int(Are.diag_values.size * 8)       # both planes = c64 bytes
    bw = (sb + 2 * n * 8) / t
    print(f"c64 banded SpMV (planes) 27-pt n={n}: {t*1e6:.1f} us/apply  "
          f"{bw/1e9:.1f} GB/s effective (target >=350)", flush=True)
    # numerics vs the complex oracle (computed on host)
    yr, yi = jax.jit(lambda vr, vi, xr, xi: dia_spmv_c64_planes(
        offs, vr, vi, meta, xr, xi))(Are.diag_values, Aim.diag_values,
                                     xr, xi)
    y = np.asarray(yr)[:, 0] + 1j * np.asarray(yi)[:, 0]
    oracle = np.zeros(n, np.complex128)
    x = np.ones(n) + 0.5j
    np.add.at(oracle, data.row_idx,
              cvals.astype(np.complex128) * x[data.col_idx])
    err = np.abs(y - oracle).max() / np.abs(oracle).max()
    print(f"c64 planes vs host oracle: rel err {err:.2e}", flush=True)


def c64solver():
    """Chip-verified complex solve through the planes kernel: BiCGSTAB on
    the real-equivalent system R(A) [x_re; x_im] = [b_re; b_im] whose
    operator applies via one dia_spmv_c64_planes call (the tunnel cannot
    compile complex dtypes; on standard TPU/CPU backends the same system
    solves directly at c64 — tests/test_complex_sweep.py)."""
    from ginkgo_tpu.base.linop import LinOp, linop_dataclass, static_field
    from ginkgo_tpu.ops.spmv_pallas import dia_spmv_c64_planes
    from ginkgo_tpu.solver import Bicgstab
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    # shifted Laplacian P + 0.5i I (the standard complex model problem;
    # spectrum in one half-plane, unlike the phase-rotated SpMV fixture)
    from ginkgo_tpu import Csr
    from ginkgo_tpu.base.matrix_data import MatrixData
    data = _stencil(32, 7)
    n = data.shape[0]
    # imag = 0.02 P + 0.5 I: full-pattern imag plane (both planes must
    # share one banded plan) with spectrum still in one half-plane
    diag = data.row_idx == data.col_idx
    cv2 = data.values.astype(np.complex128) * (1 + 0.02j)
    cv2[diag] += 0.5j
    dre = MatrixData(data.shape, data.row_idx, data.col_idx,
                     cv2.real.astype(np.float32))
    dim2 = MatrixData(data.shape, data.row_idx, data.col_idx,
                      cv2.imag.astype(np.float32))
    Are = Csr.from_data(dre, dtype=np.float32, strategy="automatical")
    Aim2 = Csr.from_data(dim2, dtype=np.float32, strategy="automatical")
    meta = dict(Are.band_meta)
    offs = Are.diag_offsets

    @linop_dataclass
    class Realified(LinOp):
        shape: tuple = static_field()
        vre: jnp.ndarray = None
        vim: jnp.ndarray = None

        def _apply(self, b):
            k = b.shape[1]
            xr, xi = b[:n], b[n:]
            yr, yi = dia_spmv_c64_planes(offs, self.vre, self.vim,
                                         meta, xr, xi)
            return jnp.concatenate([yr, yi], axis=0)

    R = Realified(shape=(2 * n, 2 * n), vre=Are.diag_values,
                  vim=Aim2.diag_values)
    b2 = jnp.concatenate([jnp.ones((n, 1), jnp.float32),
                          jnp.zeros((n, 1), jnp.float32)], axis=0)
    t0 = time.time()
    res = Bicgstab.solve(R, b2, criteria=Iteration(500)
                         | ResidualNorm(1e-6, baseline="rhs_norm"))
    wall = time.time() - t0
    xh = np.asarray(res.x)
    x = xh[:n, 0] + 1j * xh[n:, 0]
    # complex true residual on host
    r = np.ones(n, np.complex128)
    np.subtract.at(r, data.row_idx, cv2 * x[data.col_idx])
    rel = float(np.linalg.norm(r) / np.sqrt(n))
    print(f"c64 BiCGSTAB (real-equivalent planes) n={n}: "
          f"iters={int(np.asarray(res.iterations)[0])} "
          f"complex true rel resid={rel:.2e} "
          f"converged={bool(np.asarray(res.converged).all())} "
          f"wall={wall:.1f}s", flush=True)


def trisolve():
    from ginkgo_tpu import Csr
    from ginkgo_tpu.benchmark.runner import chain_k_for_backend, time_chained
    from ginkgo_tpu.factorization.par_ilu import Ic0
    from ginkgo_tpu.preconditioner.ilu import Ic
    from ginkgo_tpu.solver import Cg, LowerTrs, UpperTrs
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    data = _stencil()
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    b = jnp.ones((n, 1), jnp.float32)
    t0 = time.time()
    fact = Ic0().generate(A)
    print(f"IC(0) generate: {time.time()-t0:.1f}s", flush=True)
    k1, k2 = chain_k_for_backend()
    for algo, kw in (("exact", {}), ("level", {}),
                     ("jacobi", dict(sweeps=6))):
        t0 = time.time()
        trs = LowerTrs.build(algorithm=algo, **kw).generate(fact.l_factor)
        gen = time.time() - t0

        def make_chain(K, trs=trs):
            @jax.jit
            def chain(t, z):
                return jax.lax.fori_loop(
                    0, K, lambda _, z: t._apply(z) / K, z).sum()
            return chain

        t = time_chained(make_chain, (trs, b), k1, k2)
        print(f"LowerTrs[{algo:6s}]: gen {gen:5.1f}s  "
              f"{t*1e3:7.3f} ms/apply", flush=True)

    for label, lkw, ukw in (
            ("exact", dict(algorithm="exact"), dict(algorithm="exact")),
            ("jacobi6", dict(algorithm="jacobi", sweeps=6),
             dict(algorithm="jacobi", sweeps=6))):
        M = Ic(l_solver=LowerTrs.build(**lkw),
               u_solver=UpperTrs.build(**ukw)).generate(A)
        # M must be a jit OPERAND: as a closure constant its (nb, S, S)
        # inverse blocks are inlined into the HLO literal and the tunnel's
        # compile request overflows (HTTP 413)
        f = jax.jit(lambda A, b, M: Cg.solve(
            A, b, preconditioner=M,
            criteria=Iteration(2000)
            | ResidualNorm(1e-6, baseline="rhs_norm")).x.sum())
        float(f(A, b, M))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(A, b, M))
            best = min(best, time.perf_counter() - t0)
        res = Cg.solve(A, b, preconditioner=M,
                       criteria=Iteration(2000)
                       | ResidualNorm(1e-6, baseline="rhs_norm"))
        print(f"IC(0)-CG[{label:7s}]: iters "
              f"{int(np.asarray(res.iterations)[0]):4d}  "
              f"solve {best*1e3:7.1f} ms", flush=True)


def parilut():
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.factorization.par_ilut_packed import (generate_packed,
                                                          plan_packed_ilut)
    rng = np.random.default_rng(0)
    n, bw, per_row = 262_144, 48, 12
    rows = np.repeat(np.arange(n), per_row)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, size=rows.size),
                   0, n - 1)
    vals = rng.standard_normal(rows.size) * 0.1
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([vals, np.full(n, 8.0)])
    d = MatrixData((n, n), rows, cols, vals.astype(np.float32)).canonical()
    print(f"unstructured banded n={n} nnz={d.nnz} bw={bw}", flush=True)
    t0 = time.time()
    plan = plan_packed_ilut(d, level=3, fill_in_limit=2.0)
    t_plan = time.time() - t0
    if plan is None:
        print("plan REJECTED", flush=True)
        return
    print(f"plan: {t_plan:.1f}s  slots l={plan['nl']} u={plan['nu']} "
          f"pairs={len(plan['prod']['raw'][0])}", flush=True)
    t0 = time.time()
    out = generate_packed(d, iterations=5, fill_in_limit=2.0, sweeps=2,
                          plan=plan)
    t_cold = time.time() - t0
    from ginkgo_tpu.utils import stagetimer
    with stagetimer.collect() as st:
        t0 = time.time()
        out = generate_packed(d, iterations=5, fill_in_limit=2.0,
                              sweeps=2, plan=plan)
        t_warm = time.time() - t0
    nnz = len(out[2]) + len(out[5])
    dev = st.stages.get("device", 0.0)
    tra = st.stages.get("transfer", 0.0)
    print(f"generate_packed 5 iters fill 2x: cold {t_cold:.1f}s  "
          f"warm {t_warm:.2f}s = device {dev:.2f}s (target <=3s) "
          f"+ transfer {tra:.2f}s (tunnel artifact) "
          f"+ host {max(t_warm - dev - tra, 0.0):.2f}s  "
          f"factor nnz={nnz}", flush=True)


def parict():
    """Packed device ParICT on the symmetrized unstructured pattern."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.factorization.par_ilut_packed import (
        generate_packed_ict, plan_packed_ict)
    from ginkgo_tpu.utils import stagetimer
    rng = np.random.default_rng(0)
    n, bw, per_row = 262_144, 48, 6
    rows = np.repeat(np.arange(n), per_row)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, size=rows.size),
                   0, n - 1)
    vals = rng.standard_normal(rows.size) * 0.1
    # symmetrize (SPD-ish): A + A^T + 8I
    r2 = np.concatenate([rows, cols, np.arange(n)])
    c2 = np.concatenate([cols, rows, np.arange(n)])
    v2 = np.concatenate([vals, vals, np.full(n, 8.0)])
    d = MatrixData((n, n), r2, c2, v2.astype(np.float32)).canonical()
    print(f"unstructured symmetric n={n} nnz={d.nnz} bw={bw}", flush=True)
    t0 = time.time()
    plan = plan_packed_ict(d, level=3, fill_in_limit=2.0)
    t_plan = time.time() - t0
    if plan is None:
        print("plan REJECTED", flush=True)
        return
    print(f"plan: {t_plan:.1f}s  slots l={plan['nl']} "
          f"pairs={len(plan['prod']['raw'][0])}", flush=True)
    out = generate_packed_ict(d, iterations=5, fill_in_limit=2.0,
                              sweeps=2, plan=plan)
    with stagetimer.collect() as st:
        t0 = time.time()
        out = generate_packed_ict(d, iterations=5, fill_in_limit=2.0,
                                  sweeps=2, plan=plan)
        t_warm = time.time() - t0
    dev = st.stages.get("device", 0.0)
    tra = st.stages.get("transfer", 0.0)
    print(f"generate_packed_ict 5 iters fill 2x: warm {t_warm:.2f}s = "
          f"device {dev:.2f}s + transfer {tra:.2f}s (tunnel) + host "
          f"{max(t_warm - dev - tra, 0.0):.2f}s  factor nnz={len(out[2])}",
          flush=True)


SECTIONS = dict(c64spmv=c64spmv, c64solver=c64solver,
                trisolve=trisolve, parilut=parilut, parict=parict)

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        SECTIONS[nm]()
