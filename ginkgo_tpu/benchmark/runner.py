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
    """Test case -> MatrixData: {'filename': ...} or
    {'stencil': '5pt|9pt|7pt|27pt', 'size': edge}."""
    from ..base.mtx_io import read_mtx
    from ..utils.generators import stencil_2d, stencil_3d
    if "filename" in case:
        return read_mtx(case["filename"])
    st = case.get("stencil", "27pt")
    size = int(case.get("size", 32))
    if st in ("5pt", "9pt"):
        return stencil_2d(size, points=int(st[0]))
    if st in ("7pt", "27pt"):
        return stencil_3d(size, points=int(st[:-2]))
    raise ValueError(f"unknown test case {case!r}")


def case_name(case: dict) -> str:
    if "filename" in case:
        return case["filename"]
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
