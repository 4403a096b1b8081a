"""performance-debugging + ginkgo-overhead examples: ProfilerHook summary
table of operation ranges, plus the dispatch-overhead microbenchmark."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import io
import time

import jax
import jax.numpy as jnp

import ginkgo_tpu as gt
from ginkgo_tpu.log import ProfilerHook, capture
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import stencil_2d


def main():
    data = stencil_2d(16, points=5)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    with capture(ProfilerHook()) as prof:
        solver = Cg.build(criteria=Iteration(200) | ResidualNorm(1e-9)
                          ).generate(A)
        for _ in range(3):
            solver.apply(b)
    summary = prof.write_summary()
    print(summary)
    assert "apply" in summary.lower() or len(summary) > 0

    # ginkgo-overhead analog: per-apply dispatch overhead (eager vs jitted)
    t0 = time.perf_counter()
    for _ in range(10):
        A.apply(b).block_until_ready()
    eager = (time.perf_counter() - t0) / 10
    jitted = jax.jit(lambda A, b: A.apply(b))
    jitted(A, b).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        jitted(A, b).block_until_ready()
    compiled = (time.perf_counter() - t0) / 10
    print(f"apply overhead: eager {eager * 1e6:.0f}us vs jitted "
          f"{compiled * 1e6:.0f}us")
    assert compiled <= eager * 5  # jit path must not be grossly slower
    return {"jit_slowdown": compiled / max(eager, 1e-12),
            "jit_slowdown_bound": 5.0}


if __name__ == "__main__":
    main()
