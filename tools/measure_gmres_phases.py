"""GMRES per-iteration phase accounting on chip (round-4 audit).

Times each phase of the GMRES(m) Arnoldi iteration in isolation, as a
full m-step cycle (j advancing 0..m-1, exactly the traffic pattern of the
real solver), via chain differencing over cycles.  Compares the phase sum
against the measured full iteration and against the HBM roofline
(819 GB/s v5e speed of light), so every remaining microsecond is either
traffic-mandatory or attributed.  Analog of the reference's documented CG
traffic budget (core/solver/cg.cpp:133-141).

Phases (k=1, f32, 27-pt banded A at n=262k/1M, m=30/60):
  skeleton — while-carry + basis column write + read_one + normalize
  spmv     — A @ v (banded Pallas)
  ortho1   — one blocked-MGS projection pass (cgs uses 1, cgs2 uses 2)
  givens   — associative-scan rotation update + R/g/cs/sn writes
  norm     — compute_norm2(w)
  full     — actual GMRES iteration (Iteration-window differencing)

Run: python tools/measure_gmres_phases.py [n ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OB = 8


def cyc_time(make_cycle, args, reps=4, spread=(2, 8)):
    """Seconds per cycle by chain differencing over cycle counts."""
    def run(C):
        f = make_cycle(C)
        float(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    c1, c2 = spread
    t1, t2 = run(c1), run(c2)
    return max((t2 - t1) / (c2 - c1), 1e-9)


def main(ns=(262_144,), ms=(30, 60)):
    from ginkgo_tpu import Csr
    from ginkgo_tpu.matrix.dense import compute_norm2
    from ginkgo_tpu.solver import Gmres
    from ginkgo_tpu.solver.krylov_basis import KrylovBasis
    from ginkgo_tpu.stop.criterion import Iteration
    from ginkgo_tpu.utils.generators import stencil_3d

    for n in ns:
        side = round(n ** (1 / 3))
        data = stencil_3d(side, points=27)
        A = Csr.from_data(data, dtype=np.float32)
        n = A.shape[0]
        b = jnp.ones((n, 1), jnp.float32)
        print(f"--- n={n} ---", flush=True)
        for m in ms:
            basis = KrylovBasis(m + 1, n, 1, jnp.float32, block=OB)
            m_pad = basis.shape[0]
            V0 = basis.empty()
            w0 = b / compute_norm2(b).astype(jnp.float32)[None, :]

            def project(V, w, j):
                nblocks = (j + 1 + OB - 1) // OB

                def body(i, carry):
                    h_acc, w, V = carry
                    start = i * OB
                    blk = basis.read_block(V, start, OB, jnp.float32)
                    col = start + jnp.arange(OB)
                    mask = (col <= j)[:, None].astype(w.dtype)
                    hb = jnp.einsum("inr,nr->ir", blk, w,
                                    preferred_element_type=w.dtype) * mask
                    w = w - jnp.einsum("ir,inr->nr", hb, blk,
                                       preferred_element_type=w.dtype)
                    h_acc = jax.lax.dynamic_update_slice_in_dim(
                        h_acc, hb, start, 0)
                    return h_acc, w, V

                h0 = jnp.zeros((m_pad, 1), jnp.float32)
                h, w, _ = jax.lax.fori_loop(0, nblocks, body, (h0, w, V0))
                return h[:m + 1], w

            # --- skeleton: carry V, write column j+1, read column j,
            #     normalize (the loop frame every other phase lives in)
            def mk_skeleton(C):
                @jax.jit
                def f(V, w):
                    def cycle(_, c):
                        V, w = c

                        def step(j, c):
                            V, w = c
                            vj = basis.read_one(V, j, jnp.float32)
                            h = compute_norm2(vj + w).astype(jnp.float32)
                            v2 = (vj + w) / h[None, :]
                            return basis.write(V, j + 1, v2), v2
                        return jax.lax.fori_loop(0, m, step, (V, w))
                    V, w = jax.lax.fori_loop(0, C, cycle, (V, w))
                    return w.sum()
                return f

            # --- spmv only
            def mk_spmv(C):
                @jax.jit
                def f(V, w):
                    def cycle(_, w):
                        def step(j, w):
                            y = A._apply(w)
                            return y / compute_norm2(y).astype(
                                jnp.float32)[None, :]
                        return jax.lax.fori_loop(0, m, step, w)
                    return jax.lax.fori_loop(0, C, cycle, w).sum()
                return f

            # --- one projection pass (j advancing, V carried, not written)
            def mk_ortho1(C):
                @jax.jit
                def f(V, w):
                    def cycle(_, c):
                        V, w = c

                        def step(j, c):
                            V, w = c
                            h, w2 = project(V, w, j)
                            return V, w2 + w0
                        return jax.lax.fori_loop(0, m, step, (V, w))
                    V, w = jax.lax.fori_loop(0, C, cycle, (V, w))
                    return w.sum()
                return f

            # --- givens: rotation scan + R/g/cs/sn updates (no n-traffic)
            eye_R = jnp.broadcast_to(
                jnp.eye(m + 1, m, dtype=jnp.float32)[..., None],
                (m + 1, m, 1))

            def mk_givens(C):
                hcol0 = jnp.linspace(1.0, 2.0, m + 1)[:, None]

                @jax.jit
                def f(g0):
                    def cycle(_, carry):
                        R, g, cs, sn = carry

                        def step(j, carry):
                            R, g, cs, sn = carry
                            hcol = hcol0 * (1.0 + g[0])
                            h_new = g[0] + 1.5
                            idx = jnp.arange(m)[:, None]
                            act = idx < j
                            c_eff = jnp.where(act, cs, jnp.ones_like(cs))
                            s_eff = jnp.where(act, sn, jnp.zeros_like(sn))
                            b_next = jnp.where(idx == j, h_new[None, :],
                                               hcol[1:m + 1])
                            alpha = -s_eff
                            beta = c_eff * b_next

                            def affine(p, q):
                                a1, b1 = p
                                a2, b2 = q
                                return a2 * a1, a2 * b1 + b2

                            acc_a, acc_b = jax.lax.associative_scan(
                                affine, (alpha, beta), axis=0)
                            t = jnp.concatenate(
                                [hcol[0:1], acc_a * hcol[0:1] + acc_b],
                                axis=0)
                            rotated = c_eff * t[:m] + s_eff * b_next
                            hj = jax.lax.dynamic_index_in_dim(
                                t, j, 0, keepdims=False)
                            denom = jnp.sqrt(hj ** 2 + h_new ** 2)
                            c = jnp.where(denom == 0, jnp.ones_like(hj),
                                          hj / denom)
                            sg = h_new / denom
                            rcol = jnp.where(act, rotated,
                                             jnp.where(idx == j,
                                                       denom[None, :],
                                                       jnp.zeros_like(
                                                           rotated)))
                            rcol = jnp.concatenate(
                                [rcol, jnp.zeros((1, 1), jnp.float32)],
                                axis=0)
                            gj = jax.lax.dynamic_index_in_dim(
                                g, j, 0, keepdims=False)
                            idx1 = jnp.arange(m + 1)[:, None]
                            g2 = jnp.where(idx1 == j, (c * gj)[None, :],
                                           jnp.where(idx1 == j + 1,
                                                     (-sg * gj)[None, :],
                                                     g))
                            zero = jnp.zeros((), j.dtype)
                            R2 = jax.lax.dynamic_update_slice(
                                R, rcol[:, None, :], (zero, j, zero))
                            cs2 = jnp.where(idx == j, c[None, :], cs)
                            sn2 = jnp.where(idx == j, sg[None, :], sn)
                            return R2, g2 / (1.0 + jnp.abs(g2[0])), cs2, sn2
                        return jax.lax.fori_loop(0, m, step, carry)
                    R, g, cs, sn = jax.lax.fori_loop(
                        0, C, cycle, (eye_R, g0,
                                      jnp.zeros((m, 1), jnp.float32),
                                      jnp.zeros((m, 1), jnp.float32)))
                    return g.sum() + R.sum()
                return f

            # --- norm only
            def mk_norm(C):
                @jax.jit
                def f(w):
                    def cycle(_, w):
                        def step(j, w):
                            h = compute_norm2(w).astype(jnp.float32)
                            return w / (h[None, :] + 0.1)
                        return jax.lax.fori_loop(0, m, step, w)
                    return jax.lax.fori_loop(0, C, cycle, w).sum()
                return f

            res = {}
            res["skeleton"] = cyc_time(mk_skeleton, (V0, w0)) / m
            res["spmv"] = cyc_time(mk_spmv, (V0, w0)) / m
            res["ortho1"] = cyc_time(mk_ortho1, (V0, w0)) / m
            res["givens"] = cyc_time(
                mk_givens, (jnp.full((m + 1, 1), 0.5, jnp.float32),)) / m
            res["norm"] = cyc_time(mk_norm, (w0,)) / m

            # --- full solver iteration, Iteration-window differencing
            def full_iter(ortho):
                def timed(it):
                    f = jax.jit(lambda A, b: Gmres.solve(
                        A, b, krylov_dim=m, ortho=ortho,
                        criteria=Iteration(it)).x.sum())
                    float(f(A, b))
                    best = 1e9
                    for _ in range(3):
                        t0 = time.perf_counter()
                        float(f(A, b))
                        best = min(best, time.perf_counter() - t0)
                    return best
                lo, hi = 2 * m, 6 * m
                return (timed(hi) - timed(lo)) / (hi - lo)

            res["full_cgs"] = full_iter("cgs")
            res["full_cgs2"] = full_iter("cgs2")
            acct2 = (res["skeleton"] + res["spmv"] + 2 * res["ortho1"]
                     + res["givens"] + res["norm"])
            acct1 = (res["skeleton"] + res["spmv"] + res["ortho1"]
                     + res["givens"] + res["norm"])
            print(f"m={m}: " + "  ".join(
                f"{k}={v*1e6:7.1f}us" for k, v in res.items()), flush=True)
            print(f"      phase-sum cgs={acct1*1e6:7.1f}us (meas "
                  f"{res['full_cgs']*1e6:7.1f})   cgs2={acct2*1e6:7.1f}us "
                  f"(meas {res['full_cgs2']*1e6:7.1f})", flush=True)
            # HBM roofline: avg basis vectors touched per iteration
            avg_vec = sum(((j + 1 + OB - 1) // OB) * OB
                          for j in range(m)) / m
            bts = dict(
                skeleton=(2 + 2 + 2) * n * 4,      # write col + read col + w
                spmv=(27 * n + 2 * n) * 4,
                ortho1=2 * avg_vec * n * 4 + 2 * n * 4,
                norm=n * 4,
            )
            sol = {k: v / 819e9 for k, v in bts.items()}
            print("      roofline@819GB/s: " + "  ".join(
                f"{k}={v*1e6:6.1f}us" for k, v in sol.items()), flush=True)


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [262_144]
    main(ns=ns)
