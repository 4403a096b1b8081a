"""custom-logger + custom-stopping-criterion + simple-solver-logging
examples: a user Logger subclass on the event bus, and a user Criterion
(stop once the solution's mean exceeds a threshold)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import io

import jax.numpy as jnp
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.base.linop import linop_dataclass, static_field
from ginkgo_tpu.log import Logger, capture
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import (CheckArgs, Criterion, Iteration,
                                       ResidualNorm)
from ginkgo_tpu.utils.generators import stencil_2d


class CountingLogger(Logger):
    def __init__(self):
        super().__init__()
        self.counts = {}

    def on(self, event, **data):
        self.counts[event] = self.counts.get(event, 0) + 1


@linop_dataclass
class ResidualBelow(Criterion):
    """Custom criterion: absolute residual norm below a threshold."""

    threshold: float = static_field(default=1e-6)

    def check(self, state, args: CheckArgs):
        norm = args.get_residual_norm()
        conv = norm < self.threshold
        return conv, conv, state


def main():
    data = stencil_2d(12, points=5)
    A = gt.Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    logger = CountingLogger()
    with capture(logger):
        res = Cg.solve(A, b,
                       criteria=Iteration(500) | ResidualBelow(1e-8))
    print(f"custom criterion stopped at iter {int(res.iterations[0])}, "
          f"events seen: {logger.counts}")
    assert bool(res.converged.all())
    assert float(res.resnorm[0]) < 1e-8
    assert logger.counts.get("solve_completed", 0) == 1
    return {"converged": bool(res.converged.all()),
            "iterations": int(res.iterations[0]),
            "residual": float(res.resnorm[0]), "residual_bound": 1e-8,
            "solve_events": logger.counts.get("solve_completed", 0),
            "solve_events_bound": 1}


if __name__ == "__main__":
    main()
