"""Bounded pipelined-CGS2 experiment (VERDICT r4 task 9): is the
pass-1 -> pass-2 data dependency what keeps cgs2 at 224us vs the 148us
roofline?  A/B three cycle variants with identical HBM traffic:
  dep    — real CGS2: pass2 projects pass1's OUTPUT (serialized)
  indep  — counterfactual: pass2 re-projects pass1's INPUT (no
           dependency; XLA may interleave the two passes' basis reads)
  one    — single pass (cgs), the per-pass floor
If dep ~= indep, the dependency costs nothing on a single-instruction-
stream TPU core and pipelining (DCGS2) has no headroom; the gap is
per-pass overhead."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from ginkgo_tpu import Csr
from ginkgo_tpu.solver.krylov_basis import KrylovBasis
from ginkgo_tpu.utils.generators import stencil_3d

OB = 8
n = 262_144
m = 30
k = 1
dtype = jnp.float32
data = stencil_3d(64, points=27)
assert data.shape[0] == n
A = Csr.from_data(data, dtype=np.float32)
basis = KrylovBasis(m + 1, n, k, dtype, block=OB)
V0 = basis.empty()
# fill basis with random unit columns
rng = np.random.default_rng(0)
V = V0
for j in range(m + 1):
    c = rng.standard_normal((n, k)).astype(np.float32)
    V = basis.write(V, j, jnp.asarray(c / np.linalg.norm(c)))
w0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

def project(Vs, w, j):
    nblocks = (j + 1 + OB - 1) // OB
    def body(i, carry):
        h_acc, w, Vc = carry
        start = i * OB
        blk = basis.read_block(Vc, start, OB, dtype)
        col = start + jnp.arange(OB)
        mask = (col <= j)[:, None].astype(w.dtype)
        hb = jnp.einsum("inr,nr->ir", blk, w,
                        preferred_element_type=dtype) * mask
        w = w - jnp.einsum("ir,inr->nr", hb, blk,
                           preferred_element_type=dtype)
        h_acc = jax.lax.dynamic_update_slice_in_dim(h_acc, hb, start, 0)
        return h_acc, w, Vc
    h0 = jnp.zeros((m + 1, k), dtype)
    h, w, _ = jax.lax.fori_loop(0, nblocks, body, (h0, w, Vs))
    return h, w

def make_cycle(variant, C):
    @jax.jit
    def f(Vs, w):
        def cyc(_, w):
            def step(j, w):
                if variant == "dep":
                    h1, w1 = project(Vs, w, j)
                    h2, w2 = project(Vs, w1, j)
                    out = w2
                elif variant == "indep":
                    h1, w1 = project(Vs, w, j)
                    h2, w2 = project(Vs, w * 1.0000001, j)
                    out = w1 + 1e-7 * w2
                else:
                    h1, w1 = project(Vs, w, j)
                    h2 = h1
                    out = w1
                return out * 0.999 + 1e-6 * h2.sum()
            return jax.lax.fori_loop(0, m, step, w)
        return jax.lax.fori_loop(0, C, cyc, w).sum()
    return lambda: float(f(V, w0))

def cyc_time(variant, spread=(2, 6), reps=4):
    def run(C):
        fn = make_cycle(variant, C)
        fn()
        return min(time.perf_counter() - t0 if (t0 := time.perf_counter()) and False else
                   min((lambda s: (fn(), time.perf_counter() - s)[1])(time.perf_counter())
                       for _ in range(reps)), 1e9)
    c1, c2 = spread
    t1, t2 = run(c1), run(c2)
    return (t2 - t1) / (c2 - c1)

for variant in ("one", "dep", "indep"):
    t = cyc_time(variant)
    print(f"{variant}: {t/m*1e6:.1f} us/iter (cycle {t*1e3:.2f} ms)", flush=True)
