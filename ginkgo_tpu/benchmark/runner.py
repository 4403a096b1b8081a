"""Benchmark CLI infrastructure.

Analog of ``benchmark/utils/{general,runner,iteration_control,timer}.hpp``:
gflags-style CLI -> argparse; JSON test-case lists in, JSON results out
(schema-compatible with Ginkgo's benchmark output so ginkgo-data/GPE
tooling can diff results, SURVEY.md Appendix C).

Timer: steady-state device time via chain-depth differencing (see bench.py
rationale — this environment has large per-dispatch overhead), falling back
to plain repetition timing for non-chainable operations.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("-input", type=str, default=None,
                   help="JSON test cases (file path or literal JSON)")
    p.add_argument("-warmup", type=int, default=1)
    p.add_argument("-repetitions", type=int, default=5)
    p.add_argument("-double_buffer", action="store_true")
    p.add_argument("-detailed", action="store_true")
    p.add_argument("-output", type=str, default=None,
                   help="write JSON here instead of stdout")
    return p


def load_cases(args) -> list[dict]:
    if args.input is None:
        return [{"stencil": "27pt", "size": 32}]
    s = args.input
    if s.lstrip().startswith("["):
        return json.loads(s)
    with open(s) as f:
        return json.load(f)


def build_matrix_data(case: dict):
    """Test case -> MatrixData: {'filename': ...} (MatrixMarket, e.g.
    the ani fixtures), {'stencil': '5pt|9pt|7pt|27pt', 'size': edge},
    or {'fem': n[, 'spread': 600, 'per_row': 18, 'rcm': bool]} — the
    generated unstructured FEM class (random column offsets with mesh
    locality, diagonally dominant values; the reference's protocol runs
    SuiteSparse matrices here, BENCHMARKING.md:16)."""
    from ..base.mtx_io import read_mtx
    from ..utils.generators import stencil_2d, stencil_3d
    if "filename" in case:
        d = read_mtx(case["filename"]).canonical()
        if case.get("rcm"):
            d = _rcm(d)
        return d
    if "fem" in case:
        import numpy as np
        n = int(case["fem"])
        spread = int(case.get("spread", 600))
        per = int(case.get("per_row", 18))
        rng = np.random.default_rng(int(case.get("seed", 5)))
        block = 128
        n_off = max(2, int(round(per / 0.6)))
        offs = rng.integers(-spread, spread, (-(-n // block), n_off))
        pick = rng.random((n, n_off)) < 0.6
        r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
        c = np.clip(r + offs[np.arange(n) // block], 0, n - 1)
        rows, cols = r[pick], c[pick]
        key = np.unique(rows * n + cols)
        rows, cols = key // n, key % n
        rows = np.concatenate([rows, np.arange(n)])
        cols = np.concatenate([cols, np.arange(n)])
        off = float(case.get("offscale", 0.1))
        vals = np.concatenate([off * rng.standard_normal(key.size),
                               np.full(n, 8.0)])
        from ..base.matrix_data import MatrixData
        d = MatrixData((n, n), rows, cols, vals).canonical()
        if case.get("sym"):
            # 0.5 (M + M^T): SPD-ish for the CG-family solver cases
            d = MatrixData((n, n),
                           np.concatenate([d.row_idx, d.col_idx]),
                           np.concatenate([d.col_idx, d.row_idx]),
                           np.concatenate([d.values * 0.5,
                                           d.values * 0.5])).canonical()
        return _rcm(d) if case.get("rcm") else d
    st = case.get("stencil", "27pt")
    size = int(case.get("size", 32))
    if st in ("5pt", "9pt"):
        return stencil_2d(size, points=int(st[0]))
    if st in ("7pt", "27pt"):
        return stencil_3d(size, points=int(st[:-2]))
    raise ValueError(f"unknown test case {case!r}")


def _rcm(d):
    """RCM-permute a MatrixData (the framework's prescribed ordering
    for unstructured problems)."""
    import numpy as np
    from ..matrix.csr import Csr
    from ..reorder import Rcm
    perm = np.asarray(Rcm.build().generate(Csr.from_data(d)).perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    from ..base.matrix_data import MatrixData
    return MatrixData(d.shape, inv[d.row_idx], inv[d.col_idx],
                      d.values.copy()).canonical()


def case_name(case: dict) -> str:
    if "filename" in case:
        return case["filename"] + (" (rcm)" if case.get("rcm") else "")
    if "fem" in case:
        return (f"fem(n={case['fem']}, spread={case.get('spread', 600)}"
                f", per_row={case.get('per_row', 18)}"
                + (f", offscale={case['offscale']}" if "offscale" in case
                   else "")
                + (", sym" if case.get("sym") else "") + ")"
                + (" (rcm)" if case.get("rcm") else ""))
    return f"stencil({case.get('stencil', '27pt')}, {case.get('size', 32)})"


def time_chained(make_chain, args_tuple, k1=2, k2=8, reps=3):
    """Steady-state per-op seconds by chain-depth differencing.

    The chain spread auto-widens until the depth delta dominates dispatch
    jitter (this environment has ~25ms +- 1ms per-call overhead)."""
    def run(K):
        f = make_chain(K)
        float(f(*args_tuple))
        ts = []
        for _ in range(max(reps, 3)):
            t0 = time.perf_counter()
            float(f(*args_tuple))
            ts.append(time.perf_counter() - t0)
        return min(ts), (max(ts) - min(ts))

    for attempt in range(4):
        t1, j1 = run(k1)
        t2, j2 = run(k2)
        delta = t2 - t1
        jitter = max(j1, j2)
        if delta > max(4 * jitter, 1e-4) or attempt == 3:
            break
        k2 *= 4          # widen until signal >> noise
    return max(delta / (k2 - k1), 1e-9)


def time_blocking(fn, warmup=1, reps=5):
    """Wall time of a host-blocking operation (generate paths); waits on
    every device array in the result (pytree-aware) so async dispatch does
    not under-report."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def dispatch_overhead(reps=5):
    """Per-dispatch overhead of this environment (tunnel cost) measured on
    a trivial jitted call — subtract from single-dispatch timings."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def emit(results, args):
    out = json.dumps(results, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out + "\n")
    else:
        print(out)


def chain_k_for_backend(platform: str = None):
    """Chain depths for the differencing timer; ``platform`` overrides the
    default backend (benchmarks that fall back to another device pool must
    pass the pool's platform, not the default)."""
    plat = platform or jax.default_backend()
    on_tpu = plat in ("tpu", "axon")
    return (8, 32) if on_tpu else (2, 8)
