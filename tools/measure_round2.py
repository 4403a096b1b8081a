"""On-chip measurements for the round-2 additions.

Measures, on the attached real TPU chip, the three headline round-2 paths
(VERDICT.md "Next round" items 1, 5, 6):

  1. packed-slot windowed-ELL SpMV on general UNSTRUCTURED matrices
     (FEM-like scattered patterns that are NOT band-dominated) vs the
     classical gather tier and vs in-situ STREAM;
  2. GMRES(30) per-iteration cost at n=262k after the aliased basis work;
  3. df64-residual iterative refinement: on-chip fp64-level residual.

Timing is chain-depth differenced (see bench.py) — never time one call.
Run:  python tools/measure_round2.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time_call(f, args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _net(make_chain, args, k1, k2):
    t1 = _time_call(make_chain(k1), args)
    t2 = _time_call(make_chain(k2), args)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def measure_stream():
    n = 64 * 1024 * 1024
    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 0.5, jnp.float32)

    def make_chain(K):
        @jax.jit
        def triad(a, b):
            def body(_, z):
                return a * 1.0000001 + z * 0.9999999
            return jax.lax.fori_loop(0, K, body, b).sum()
        return triad

    t = _net(make_chain, (a, b), 8, 40)
    return 3 * n * 4 / t / 1e9


def fem_like(n, n_off=30, spread=600, block=128, seed=5):
    """Unstructured FEM-ish pattern: per-row-block random column offsets,
    60% dropout — scattered, non-banded, but with the column locality a
    mesh numbering (or RCM) gives."""
    rng = np.random.default_rng(seed)
    offs = rng.integers(-spread, spread, (n // block, n_off))
    pick = rng.random((n, n_off)) < 0.6
    r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
    c = np.clip(r + offs[np.arange(n) // block], 0, n - 1)
    rows, cols = r[pick], c[pick]
    key = np.unique(rows * n + cols)
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    vals = rng.standard_normal(rows.size).astype(np.float64)
    from ginkgo_tpu.base.matrix_data import MatrixData
    return MatrixData((n, n), rows, cols, vals)


def scattered_rcm(n, avg_deg=12, seed=7):
    """Geometric random graph (3-D points, nearest-ish neighbors) with NO
    useful initial ordering; RCM is applied as the framework prescribes.
    This is the 'RCM'd SuiteSparse pattern that is not band-dominated'
    case from VERDICT item 1."""
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 3)).astype(np.float32)
    # k-NN via a uniform grid: connect each point to others in its cell
    g = max(int(round((n / avg_deg) ** (1 / 3))), 2)
    cell = np.minimum((pts * g).astype(np.int64), g - 1)
    cid = (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2]
    order = np.argsort(cid, kind="stable")
    cs = cid[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    ends = np.r_[starts[1:], cs.size]
    rows_l, cols_l = [], []
    for s, e in zip(starts, ends):
        members = order[s:e]
        if members.size < 2:
            continue
        a = np.repeat(members, members.size)
        b = np.tile(members, members.size)
        m = a != b
        rows_l.append(a[m])
        cols_l.append(b[m])
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    key = np.unique(rows * n + cols)
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    # scramble the numbering so the raw matrix has no locality at all
    perm = rng.permutation(n)
    rows, cols = perm[rows], perm[cols]
    key = np.unique(rows * n + cols)
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    vals = rng.standard_normal(rows.size)
    from ginkgo_tpu.base.matrix_data import MatrixData
    return MatrixData((n, n), rows, cols, vals)


def time_spmv(A, n, k1=8, k2=64):
    x = jnp.ones((n, 1), jnp.float32)
    nrm = float(jnp.abs(A._apply(x)).max())
    scale = 1.0 / max(nrm, 1.0)

    def make_chain(K):
        @jax.jit
        def chain(A, z):
            return jax.lax.fori_loop(
                0, K, lambda _, z: A._apply(z) * scale, z).sum()
        return chain

    return _net(make_chain, (A, x), k1, k2)


def spmv_report(data, label, stream_gbps, out):
    from ginkgo_tpu import Csr
    n = data.shape[0]
    nnz = data.canonical().nnz
    for strat in ("packed", "classical"):
        try:
            A = Csr.from_data(data, dtype=np.float32, strategy=strat)
        except Exception as e:  # packed may reject
            out[f"{label}.{strat}"] = {"error": str(e)[:120]}
            continue
        eff = getattr(A, "strategy", strat)
        k1, k2 = (8, 64) if eff != "classical" else (2, 6)
        t = time_spmv(A, n, k1, k2)
        if eff == "packed":
            tail = (0 if A.tail_vals is None
                    else int(A.tail_vals.size * (4 + 8)))
            sb = int(A.pell_vals.size * (4 + 2)) + tail
        else:
            sb = int(nnz * 8) + (n + 1) * 4
        gbps = (sb + 2 * n * 4) / t / 1e9
        out[f"{label}.{strat}"] = {
            "n": n, "nnz": int(nnz), "strategy": eff,
            "t_apply_us": round(t * 1e6, 1),
            "gnnz_per_s": round(nnz / t / 1e9, 2),
            "eff_gbps": round(gbps, 1),
            "pct_stream": round(100 * gbps / stream_gbps, 1),
        }
        print(label, strat, out[f"{label}.{strat}"], flush=True)


def measure_gmres(n_edge=64):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.solver import Gmres
    from ginkgo_tpu.stop.criterion import Iteration
    from ginkgo_tpu.utils.generators import stencil_3d
    data = stencil_3d(n_edge, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    b = jnp.ones((n, 1), jnp.float32)
    out = {}
    for m in (30,):
        t_by_iters = {}
        for iters in (40, 160):
            f = jax.jit(lambda A, b, it=iters: Gmres.solve(
                A, b, krylov_dim=m, ortho="cgs2",
                criteria=Iteration(it)).x)
            jax.block_until_ready(f(A, b))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(A, b))
                ts.append(time.perf_counter() - t0)
            t_by_iters[iters] = min(ts)
        per_it = (t_by_iters[160] - t_by_iters[40]) / 120
        out[f"gmres_m{m}_us_per_iter"] = round(per_it * 1e6, 1)
        print(f"GMRES({m}) n={n}: {per_it*1e6:.1f} us/iter", flush=True)
    return out


def measure_df64(n_edge=64):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.ops import df64 as D
    from ginkgo_tpu.solver import Cg
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    from ginkgo_tpu.utils.generators import stencil_3d
    data = stencil_3d(n_edge, points=27)
    A = Csr.from_data(data, dtype=np.float32)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)

    crit = ResidualNorm(1e-7, baseline="rhs_norm") | Iteration(400)

    def inner(A, r):
        return Cg.solve(A, r, criteria=crit).x

    t0 = time.perf_counter()
    (xh, xl), hist = D.ir_df64(A, b, inner, iterations=4)
    jax.block_until_ready(xh)
    t = time.perf_counter() - t0
    # f64 oracle residual on host
    import scipy.sparse as sp
    d = data.canonical()
    As = sp.csr_matrix((d.values, (d.row_idx, d.col_idx)), shape=d.shape)
    x64 = (np.asarray(xh, np.float64) + np.asarray(xl, np.float64)).ravel()
    r = np.asarray(b, np.float64).ravel() - As @ x64
    rel = float(np.linalg.norm(r) / np.linalg.norm(np.asarray(b)))
    print(f"df64-IR n={n}: rel residual {rel:.2e} in {t:.1f}s "
          f"(incl. compile)", flush=True)
    return {"df64_ir_rel_residual": rel, "df64_ir_total_s": round(t, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    out = {}
    stream = measure_stream()
    out["stream_gbps"] = round(stream, 1)
    print(f"STREAM {stream:.0f} GB/s", flush=True)

    do = lambda name: (not args.only) or name in args.only

    if do("packed"):
        n = 2**19 if args.quick else 2**21
        spmv_report(fem_like(n), "fem", stream, out)
        # 2**18 regardless of --quick: the python cell-loop generator and
        # host RCM dominate beyond that (the kernel number is size-stable)
        n2 = 2**18
        data = scattered_rcm(n2)
        from ginkgo_tpu.matrix.permutation import permute_data, permute_mode
        from ginkgo_tpu.reorder.rcm import rcm_ordering
        perm = rcm_ordering(data)
        spmv_report(permute_data(data, perm, permute_mode.symmetric),
                    "geo_rcm", stream, out)
    if do("ksweep"):
        from ginkgo_tpu import Csr
        data = fem_like(2**19 if args.quick else 2**20)
        A = Csr.from_data(data, dtype=np.float32, strategy="packed")
        n = data.shape[0]
        nnz = data.canonical().nnz
        for k in (1, 4, 8):
            x = jnp.ones((n, k), jnp.float32)
            nrm = float(jnp.abs(A._apply(x)).max())
            scale = 1.0 / max(nrm, 1.0)

            def make_chain(K, A=A, scale=scale):
                @jax.jit
                def chain(A, z):
                    return jax.lax.fori_loop(
                        0, K, lambda _, z: A._apply(z) * scale, z).sum()
                return chain

            t = _net(make_chain, (A, x), 8, 64)
            out[f"packed_k{k}"] = {
                "t_apply_us": round(t * 1e6, 1),
                "gnnz_per_s": round(nnz * k / t / 1e9, 2)}
            print(f"packed k={k}: {out[f'packed_k{k}']}", flush=True)
    if do("gmres"):
        out.update(measure_gmres(40 if args.quick else 64))
    if do("df64"):
        out.update(measure_df64(40 if args.quick else 64))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
