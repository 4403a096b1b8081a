"""Round-5 chip measurements: windowed pair-contract kernel on the
wide-spread FEM class, packed ParILUT at n=262k +-600, and plan reuse.

Run on the real chip (default platform).  Timing uses chain-depth
differencing (25 ms dispatch tunnel overhead).
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np


def net_time(make_chain, reps=3, depths=(1, 5)):
    """Per-link seconds via chain-depth differencing."""
    import jax
    c1, c2 = (make_chain(d) for d in depths)
    ts = {}
    for name, fn in (("c1", c1), ("c2", c2)):
        fn()  # compile+warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    return (ts["c2"] - ts["c1"]) / (depths[1] - depths[0])


def kernel_ab(n_out=2_000_000, pairs_per=8, spread_u=20_000,
              spread_l=3_000, seed=0):
    """Windowed pair kernel on a fragmented list vs the 8ns gather
    reference path."""
    import jax, jax.numpy as jnp
    from ginkgo_tpu.ops.pair_contract import (plan_pair_contract,
        pair_contract_pallas, _select_shifts, _NV_CAP)
    rng = np.random.default_rng(seed)
    n_a = n_b = n_out
    po = np.repeat(np.arange(n_out), rng.poisson(pairs_per, n_out))
    m = len(po)
    pl = np.clip(po + rng.integers(-spread_l, spread_l, m), 0, n_a - 1
                 ).astype(np.int32)
    pu = np.clip(po + rng.integers(-spread_u, spread_u, m), 0, n_b - 1
                 ).astype(np.int32)
    t0 = time.time()
    s = _select_shifts(pl, pu, po, n_out, _NV_CAP)
    plan = plan_pair_contract(pl, pu, po, n_out, n_a, n_b)
    print(f"npairs={m} shifts={s} plan={time.time()-t0:.1f}s", flush=True)
    if plan is None:
        print("REJECT"); return
    md = dict(plan["meta"])
    print(f"NV={md['NV']} GWL={md['GWL']} GWU={md['GWU']} "
          f"WLr={md['WLr']} WUr={md['WUr']} fill={plan['fill']:.3f} "
          f"tail={len(plan['tail'][0])/m:.4f}", flush=True)
    a = jnp.asarray(rng.standard_normal(n_a).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n_b).astype(np.float32))
    arrs = {k: jnp.asarray(plan[k]) for k in
            ("pls", "pus", "pos", "pes", "pesp", "lq", "uq", "nv",
             "lbase", "ubase")}
    arrs["tail"] = tuple(jnp.asarray(t) for t in plan["tail"])

    def make_chain(depth):
        @jax.jit
        def f(a0, bb, ar):
            x = a0
            for _ in range(depth):
                y = pair_contract_pallas(x, bb, ar, plan["meta"])
                x = y[:n_a] * 1e-6 + a0
            return x
        return lambda: jax.block_until_ready(f(a, b, arrs))
    t = net_time(make_chain)
    print(f"kernel: {t*1e3:.2f} ms -> {m/t/1e9:.2f} G real pairs/s "
          f"({md['T']*md['NV']*1024/t/1e9:.2f} G padded/s)", flush=True)

    # reference gather path A/B
    pld = jnp.asarray(pl); pud = jnp.asarray(pu); pod = jnp.asarray(po)
    def make_ref(depth):
        @jax.jit
        def f(a0, bb, l_, u_, o_):
            x = a0
            for _ in range(depth):
                y = jax.ops.segment_sum(x[l_] * bb[u_], o_,
                                        num_segments=n_out,
                                        indices_are_sorted=True)
                x = y[:n_a] * 1e-6 + a0
            return x
        return lambda: jax.block_until_ready(f(a, b, pld, pud, pod))
    tr = net_time(make_ref)
    print(f"gather ref: {tr*1e3:.2f} ms -> {m/tr/1e9:.2f} G pairs/s; "
          f"speedup {tr/t:.1f}x", flush=True)


def _onpat_resid(d, lr, lc, lv, ur, uc, uv):
    """||A - L U||_F restricted to A's pattern (scipy, exact)."""
    import scipy.sparse as sp
    n = d.shape[0]
    L = sp.csr_matrix((np.concatenate([lv, np.ones(n)]),
                       (np.concatenate([lr, np.arange(n)]),
                        np.concatenate([lc, np.arange(n)]))),
                      shape=(n, n))
    U = sp.csr_matrix((uv, (ur, uc)), shape=(n, n))
    P = L @ U
    A = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)), shape=(n, n))
    diff = (A - P).tocsr()
    mask = A.copy()
    mask.data[:] = 1.0
    on = diff.multiply(mask)
    return float(np.sqrt((on.data ** 2).sum()))


def ilut_262k(n=262144, spread=600, n_off=30, iterations=3):
    """Flagship: packed device ParILUT on the +-600-spread FEM class
    (BENCHMARKS.md packed-SpMV acceptance class) vs the host native
    path, factor quality + stage timings."""
    import jax
    sys.path.insert(0, "tools")
    from measure_round2 import fem_like
    from ginkgo_tpu.factorization.par_ilut import ParIlut
    from ginkgo_tpu.factorization.par_ilut_packed import plan_packed_ilut
    from ginkgo_tpu.utils import stagetimer

    d0 = fem_like(n, n_off=n_off, spread=spread)
    # fem_like has no guaranteed diagonal; ParILUT needs u_jj != 0.
    # Diagonally-dominant values keep the fixed point well-conditioned.
    rows = np.concatenate([d0.row_idx, np.arange(n)])
    cols = np.concatenate([d0.col_idx, np.arange(n)])
    vals = np.concatenate([0.1 * d0.values, np.full(n, 8.0)])
    d = type(d0)(d0.shape, rows, cols, vals).canonical()
    print(f"n={n} nnz={d.nnz} ({d.nnz/n:.1f}/row) spread=+-{spread}",
          flush=True)

    t0 = time.time()
    with stagetimer.collect() as st:
        f_pk = ParIlut(iterations=iterations, fill_in_limit=2.0,
                       algorithm="packed").generate(d)
    t_pk = time.time() - t0
    print(f"packed: {t_pk:.1f}s total, stages={st.stages}", flush=True)
    lpk = f_pk.l_factor.to_matrix_data().canonical()
    upk = f_pk.u_factor.to_matrix_data().canonical()
    off = lpk.row_idx != lpk.col_idx
    r_pk = _onpat_resid(d, lpk.row_idx[off], lpk.col_idx[off],
                        lpk.values[off], upk.row_idx, upk.col_idx,
                        upk.values)
    print(f"packed: nnz={lpk.nnz + upk.nnz} onpat_resid={r_pk:.4e}",
          flush=True)

    # same-pattern regenerate (new values): plan + streams cached
    d2 = type(d)(d.shape, d.row_idx, d.col_idx, d.values * 1.5)
    t0 = time.time()
    with stagetimer.collect() as st2:
        f_r = ParIlut(iterations=iterations, fill_in_limit=2.0,
                      algorithm="packed").generate(d2)
    t_re = time.time() - t0
    print(f"regen:  {t_re:.1f}s total, stages={st2.stages} "
          f"(first-gen speedup {t_pk/t_re:.1f}x)", flush=True)
    del f_r

    t0 = time.time()
    f_h = ParIlut(iterations=iterations, fill_in_limit=2.0,
                  algorithm="general").generate(d)
    t_h = time.time() - t0
    lh = f_h.l_factor.to_matrix_data().canonical()
    uh = f_h.u_factor.to_matrix_data().canonical()
    offh = lh.row_idx != lh.col_idx
    r_h = _onpat_resid(d, lh.row_idx[offh], lh.col_idx[offh],
                       lh.values[offh], uh.row_idx, uh.col_idx, uh.values)
    print(f"host:   {t_h:.1f}s nnz={lh.nnz + uh.nnz} "
          f"onpat_resid={r_h:.4e}", flush=True)
    print(f"speedup total={t_h/t_pk:.2f}x quality_ratio={r_pk/r_h:.3f}",
          flush=True)


def _fem262k(n=262144, spread=600, n_off=30):
    sys.path.insert(0, "tools")
    from measure_round2 import fem_like
    d0 = fem_like(n, n_off=n_off, spread=spread)
    rows = np.concatenate([d0.row_idx, np.arange(n)])
    cols = np.concatenate([d0.col_idx, np.arange(n)])
    vals = np.concatenate([0.1 * d0.values, np.full(n, 8.0)])
    return type(d0)(d0.shape, rows, cols, vals).canonical()


def isai_262k(n=262144):
    """Unstructured device ISAI generate at n=262k (+-600 FEM class):
    first generate (symbolics + transfer + device) and the cached
    same-pattern regenerate."""
    from ginkgo_tpu.preconditioner.isai import generate_isai
    from ginkgo_tpu import Csr
    from ginkgo_tpu.utils import stagetimer
    d = _fem262k(n)
    A = Csr.from_data(d)
    print(f"n={n} nnz={d.nnz}", flush=True)
    for run in ("first", "regen"):
        t0 = time.time()
        with stagetimer.collect() as st:
            M = generate_isai(A, 1, "general")
        print(f"{run}: {time.time()-t0:.1f}s stages={st.stages} "
              f"nnz={M.nnz}", flush=True)


def pgm_262k(n=262144):
    """Unstructured device PGM aggregation + hierarchy at n=262k."""
    from ginkgo_tpu import Csr
    from ginkgo_tpu.multigrid.pgm import Pgm
    d = _fem262k(n)
    # symmetrize values so aggregation has real edges
    A = Csr.from_data(d)
    print(f"n={n} nnz={d.nnz}", flush=True)
    from ginkgo_tpu.utils import stagetimer
    for algorithm in ("packed", "general"):
        t0 = time.time()
        with stagetimer.collect() as st:
            lvl = Pgm(algorithm=algorithm).generate(A)
        print(f"{algorithm}: {time.time()-t0:.1f}s stages={st.stages} "
              f"nc={lvl.coarse_op.shape[0]}", flush=True)


def e2e_262k(n=262144):
    """Integration headline: the whole unstructured pipeline on one
    problem — fem +-600 at n=262k, BiCGSTAB with Ilu(packed ParILUT)
    whose trisolves run the packed exact Pallas solve, vs
    unpreconditioned.  Reports first generate, cached regenerate, and
    solve wall/iterations."""
    import time
    import jax, jax.numpy as jnp
    from ginkgo_tpu import Csr
    from ginkgo_tpu.factorization.par_ilut import ParIlut
    from ginkgo_tpu.preconditioner.ilu import Ilu
    from ginkgo_tpu.solver import Bicgstab
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    from ginkgo_tpu.utils import stagetimer

    d = _fem262k(n)
    d = type(d)(d.shape, d.row_idx, d.col_idx,
                d.values.astype(np.float32))
    A = Csr.from_data(d, dtype=np.float32)
    print(f"n={n} nnz={d.nnz} strategy={A.strategy}", flush=True)
    b = jnp.ones(n, jnp.float32)
    crit = Iteration(400) | ResidualNorm(1e-7, baseline="rhs_norm")

    t0 = time.time()
    plain = Bicgstab.solve(A, b, criteria=crit)
    t_plain = time.time() - t0
    print(f"plain BiCGSTAB: iters={int(np.asarray(plain.iterations)[0])} "
          f"conv={bool(np.asarray(plain.converged).all())} "
          f"wall={t_plain:.1f}s", flush=True)

    pre = Ilu(ParIlut(iterations=3, algorithm="packed"))
    for run in ("first", "regen"):
        t0 = time.time()
        with stagetimer.collect() as st:
            M = pre.generate(A)
        t_gen = time.time() - t0
        print(f"Ilu(ParIlut packed) generate [{run}]: {t_gen:.1f}s "
              f"stages={st.stages}", flush=True)
    t0 = time.time()
    prec = Bicgstab.solve(A, b, criteria=crit, preconditioner=M)
    t_prec = time.time() - t0
    it_pl = int(np.asarray(plain.iterations)[0])
    it_pr = int(np.asarray(prec.iterations)[0])
    print(f"ILU-BiCGSTAB: iters={it_pr} "
          f"conv={bool(np.asarray(prec.converged).all())} "
          f"wall={t_prec:.1f}s "
          f"(iters {it_pl}->{it_pr}, solve {t_plain:.1f}->{t_prec:.1f}s)",
          flush=True)
    tru = float(jnp.linalg.norm(b - A.apply(prec.x))) / float(
        jnp.linalg.norm(b))
    print(f"true rel resid={tru:.2e}", flush=True)


def c64_gmres():
    """Chip-verified complex GMRES through the planes kernel on the
    real-equivalent system (the axon tunnel cannot compile complex
    executables; standard TPU/CPU backends solve the same system
    directly at c64 — tests/test_complex_sweep.py)."""
    import time
    import jax, jax.numpy as jnp
    sys.path.insert(0, "tools")
    from measure_round4 import _stencil
    from ginkgo_tpu import Csr
    from ginkgo_tpu.base.linop import LinOp, linop_dataclass, static_field
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.ops.spmv_pallas import dia_spmv_c64_planes
    from ginkgo_tpu.solver import Gmres
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm

    data = _stencil(32, 7)
    n = data.shape[0]
    diag = data.row_idx == data.col_idx
    cv2 = data.values.astype(np.complex128) * (1 + 0.02j)
    cv2[diag] += 0.5j
    dre = MatrixData(data.shape, data.row_idx, data.col_idx,
                     cv2.real.astype(np.float32))
    dim2 = MatrixData(data.shape, data.row_idx, data.col_idx,
                      cv2.imag.astype(np.float32))
    Are = Csr.from_data(dre, dtype=np.float32, strategy="automatical")
    Aim = Csr.from_data(dim2, dtype=np.float32, strategy="automatical")
    meta = dict(Are.band_meta)
    offs = Are.diag_offsets

    @linop_dataclass
    class Realified(LinOp):
        shape: tuple = static_field()
        vre: jnp.ndarray = None
        vim: jnp.ndarray = None

        def _apply(self, b):
            xr, xi = b[:n], b[n:]
            yr, yi = dia_spmv_c64_planes(offs, self.vre, self.vim,
                                         meta, xr, xi)
            return jnp.concatenate([yr, yi], axis=0)

    R = Realified(shape=(2 * n, 2 * n), vre=Are.diag_values,
                  vim=Aim.diag_values)
    b2 = jnp.concatenate([jnp.ones((n, 1), jnp.float32),
                          jnp.zeros((n, 1), jnp.float32)], axis=0)
    t0 = time.time()
    res = Gmres.solve(R, b2, criteria=Iteration(600)
                      | ResidualNorm(1e-6, baseline="rhs_norm"),
                      krylov_dim=40)
    wall = time.time() - t0
    xh = np.asarray(res.x)
    x = xh[:n, 0] + 1j * xh[n:, 0]
    r = np.ones(n, np.complex128)
    np.subtract.at(r, data.row_idx, cv2 * x[data.col_idx])
    rel = float(np.linalg.norm(r) / np.sqrt(n))
    print(f"c64 GMRES(40) (real-equivalent planes) n={n}: "
          f"iters={int(np.asarray(res.iterations)[0])} "
          f"complex true rel resid={rel:.2e} "
          f"converged={bool(np.asarray(res.converged).all())} "
          f"wall={wall:.1f}s", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if what == "kernel":
        kernel_ab()
    elif what == "ilut262k":
        ilut_262k(*(int(x) for x in sys.argv[2:]))
    elif what == "isai262k":
        isai_262k(*(int(x) for x in sys.argv[2:]))
    elif what == "pgm262k":
        pgm_262k(*(int(x) for x in sys.argv[2:]))
    elif what == "c64gmres":
        c64_gmres()
    elif what == "e2e262k":
        e2e_262k(*(int(x) for x in sys.argv[2:]))
    else:
        raise SystemExit(f"unknown subcommand {what!r}: kernel | "
                         "ilut262k | isai262k | pgm262k | c64gmres | "
                         "e2e262k")
