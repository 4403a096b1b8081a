"""file-config-solver example: build the whole solver stack from a JSON
or YAML config (extensions/config json_config.hpp / yaml_config.hpp
analogs)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import json
import tempfile

import jax.numpy as jnp

import ginkgo_tpu as gt
from ginkgo_tpu.config import parse_json, registry
from ginkgo_tpu.utils.generators import stencil_2d

CONFIG = {
    "type": "solver::Cg",
    "criteria": [
        {"type": "stop::Iteration", "max_iters": 1000},
        {"type": "stop::ResidualNorm", "reduction_factor": 1e-10},
    ],
    "preconditioner": {"type": "preconditioner::Jacobi",
                       "max_block_size": 4},
}


def main():
    data = stencil_2d(16, points=5)
    A = gt.Csr.from_data(data)
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(CONFIG, f)
        path = f.name
    solver = parse_json(path).generate(A)
    b = jnp.ones(A.shape[0])
    x = solver.apply(b)
    res = float(jnp.linalg.norm(b - A.apply(x)))
    print(f"config-built solver residual: {res:.2e}")
    assert res < 1e-7

    # the same stack from YAML (anchors + the << merge key both work)
    from ginkgo_tpu.config import parse_yaml
    yaml_solver = parse_yaml(
        "type: solver::Cg\n"
        "criteria:\n"
        "  - {type: 'stop::Iteration', max_iters: 1000}\n"
        "  - {type: 'stop::ResidualNorm', reduction_factor: 1.0e-10}\n"
        "preconditioner: {type: 'preconditioner::Jacobi', max_block_size: 4}\n"
    ).generate(A)
    res_y = float(jnp.linalg.norm(b - A.apply(yaml_solver.apply(b))))
    print(f"yaml-config solver residual: {res_y:.2e}")
    assert res_y < 1e-7
    return {"residual": res, "residual_bound": 1e-7,
            "yaml_residual": res_y, "yaml_residual_bound": 1e-7}


if __name__ == "__main__":
    main()
