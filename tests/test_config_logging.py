"""Config parsing + logging/observability tests
(core/test/config/*, core/test/log/* analogs; file-config-solver,
custom-logger, simple-solver-logging examples)."""

import io
import json

import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr
from ginkgo_tpu.config import parse, parse_json, pnode, registry
from ginkgo_tpu.log import (Convergence, PerformanceHint, ProfilerHook,
                            Record, SolverProgress, Stream, capture)
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm, Time
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd


def _spd(n=30, seed=0):
    data = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 5), seed=seed), shift=1.0)
    return Csr.from_data(data)


# -- property tree -------------------------------------------------------------

def test_pnode():
    p = pnode({"a": 1, "b": [1.5, True], "c": "x"})
    assert p.is_map and not p.is_scalar
    assert p.get("a").get_integer() == 1
    assert p.get("b").is_array and p.get("b").at(1).get_boolean()
    assert p.get("c").get_string() == "x"
    assert p.get("missing").is_empty
    with pytest.raises(TypeError):
        p.get("a").get_string()
    with pytest.raises(TypeError):
        p.get("b").at(0).get_integer()   # 1.5 is not an integer


# -- config parse ----------------------------------------------------------------

def test_parse_cg_config():
    cfg = {
        "type": "solver::Cg",
        "criteria": [
            {"type": "stop::Iteration", "max_iters": 500},
            {"type": "stop::ResidualNorm", "reduction_factor": 1e-11},
        ],
        "preconditioner": {"type": "preconditioner::Jacobi"},
    }
    factory = parse(cfg)
    A = _spd()
    solver = factory.generate(A)
    x = solver.apply(jnp.ones(30))
    np.testing.assert_allclose(A.apply(x), 1.0, rtol=1e-8)


def test_parse_json_string_and_registry():
    A = _spd(seed=1)
    reg = registry({"my_precond": A.extract_diagonal().inverse()})
    cfg = json.dumps({
        "type": "solver::Bicgstab",
        "criteria": [{"type": "stop::Iteration", "max_iters": 400},
                     {"type": "stop::ResidualNorm",
                      "reduction_factor": 1e-10}],
        "preconditioner": "my_precond",
    })
    solver = parse_json(cfg, reg).generate(A)
    x = solver.apply(jnp.ones(30))
    np.testing.assert_allclose(A.apply(x), 1.0, rtol=1e-7)


def test_parse_json_file(tmp_path):
    """file-config-solver example analog."""
    path = tmp_path / "solver.json"
    path.write_text(json.dumps({
        "type": "solver::Gmres", "krylov_dim": 20,
        "criteria": [{"type": "stop::Iteration", "max_iters": 300},
                     {"type": "stop::ResidualNorm",
                      "reduction_factor": 1e-10}]}))
    A = _spd(seed=2)
    solver = parse_json(str(path)).generate(A)
    x = solver.apply(jnp.ones(30))
    np.testing.assert_allclose(A.apply(x), 1.0, rtol=1e-7)


def test_parse_nested_ilu_config():
    cfg = {"type": "preconditioner::Ilu",
           "factorization": {"type": "factorization::ParIlu",
                             "iterations": 10}}
    A = _spd(seed=3)
    M = parse(cfg).generate(A)
    assert M.shape == (30, 30)


def test_parse_yaml_string_anchor_merge():
    """YAML front end (yaml_config.hpp analog) including the << merge key
    the reference resolves manually (yaml_config.hpp:44-70)."""
    from ginkgo_tpu.config import parse_yaml
    cfg = """
type: "solver::Ir"
criteria: &crit
  - {type: "stop::Iteration", max_iters: 40}
  - {type: "stop::ResidualNorm", reduction_factor: 1.0e-10}
solver:
  type: "solver::Cg"
  criteria: *crit
  <<: {preconditioner: {type: "preconditioner::Jacobi"}}
"""
    factory = parse_yaml(cfg)
    A = _spd(seed=6)
    x = factory.generate(A).apply(jnp.ones(30))
    np.testing.assert_allclose(A.apply(x), 1.0, rtol=1e-7)


def test_parse_yaml_file(tmp_path):
    from ginkgo_tpu.config import parse_yaml
    path = tmp_path / "solver.yaml"
    path.write_text(
        "type: solver::Gmres\n"
        "krylov_dim: 20\n"
        "criteria:\n"
        "  - {type: 'stop::Iteration', max_iters: 300}\n"
        "  - {type: 'stop::ResidualNorm', reduction_factor: 1.0e-10}\n")
    A = _spd(seed=7)
    solver = parse_yaml(str(path)).generate(A)
    x = solver.apply(jnp.ones(30))
    np.testing.assert_allclose(A.apply(x), 1.0, rtol=1e-7)
    with pytest.raises(ValueError):
        parse_yaml("- 1\n- 2\n")


def test_parse_errors():
    with pytest.raises(ValueError):
        parse({"no_type": 1})
    with pytest.raises(ValueError):
        parse({"type": "solver::DoesNotExist"})
    with pytest.raises(TypeError):
        parse([1, 2, 3])


# -- logging ----------------------------------------------------------------------

def test_convergence_logger():
    A = _spd(seed=4)
    with capture(Convergence()) as conv:
        Cg.solve(A, jnp.ones(30),
                 criteria=Iteration(500) | ResidualNorm(1e-10))
    assert conv.has_converged()
    assert conv.num_iterations > 0
    assert conv.residual_norm.max() < 1e-8


def test_record_and_stream_loggers():
    A = _spd(seed=5)
    buf = io.StringIO()
    with capture(Record(), Stream(buf)) as (rec, _):
        M = Cg.build(criteria=Iteration(100) | ResidualNorm(1e-8)
                     ).generate(A)
        M.apply(jnp.ones(30))
    events = [e for e, _ in rec.data]
    assert "linop_factory_generate_started" in events
    assert "linop_factory_generate_completed" in events
    assert "linop_apply_started" in events
    assert "solve_completed" in events
    assert "linop_factory_generate_started" in buf.getvalue()


def test_solver_progress_logger():
    A = _spd(seed=6)
    buf = io.StringIO()
    with capture(SolverProgress(buf)) as prog:
        Cg.solve(A, jnp.ones(30), trace=True,
                 criteria=Iteration(100) | ResidualNorm(1e-10))
    assert prog.history is not None
    assert prog.history.shape[0] == 101
    assert "e-" in buf.getvalue()


def test_profiler_hook_summary():
    A = _spd(seed=7)
    with capture(ProfilerHook()) as prof:
        f = Cg.build(criteria=Iteration(50) | ResidualNorm(1e-8))
        op = f.generate(A)
        op.apply(jnp.ones(30))
        op.apply(jnp.ones(30))
    summary = prof.create_summary()
    assert any(cnt >= 2 for cnt, _ in summary.values())
    table = prof.write_summary()
    assert "| range |" in table


def test_performance_hint():
    A = _spd(seed=8)
    buf = io.StringIO()
    with capture(PerformanceHint(buf, threshold=5)):
        for _ in range(6):
            A.apply(jnp.ones(30))
    assert "wrap the loop in jax.jit" in buf.getvalue()


def test_time_criterion_host_loop():
    A = _spd(seed=9)
    # generous limit -> converges normally through the host loop
    res = Cg.solve(A, jnp.ones(30),
                   criteria=Iteration(500) | ResidualNorm(1e-10)
                   | Time(time_limit=60.0))
    assert bool(res.converged.all())
    # zero limit -> stops immediately without convergence
    res0 = Cg.solve(A, jnp.ones(30),
                    criteria=Iteration(500) | ResidualNorm(1e-14)
                    | Time(time_limit=0.0))
    assert not bool(res0.converged.any())
    assert int(res0.iterations[0]) <= 1


def test_iteration_complete_events_in_host_loop():
    from ginkgo_tpu.log import Record
    A = _spd(seed=10)
    with capture(Record()) as rec:
        Cg.solve(A, jnp.ones(30),
                 criteria=Iteration(20) | ResidualNorm(1e-10)
                 | Time(time_limit=60.0))
    iters = [d for e, d in rec.data if e == "iteration_complete"]
    assert len(iters) >= 1
    # criterion_check_completed fires alongside each host-loop check
    checks = [d for e, d in rec.data if e == "criterion_check_completed"]
    assert len(checks) == len(iters)
    assert checks[-1]["num_converged"] >= 1


def test_batch_solve_completed_event():
    from ginkgo_tpu.batch import BatchCg, BatchCsr
    from ginkgo_tpu.log import Record
    from ginkgo_tpu.utils.generators import stencil_2d
    data = stencil_2d(5, points=5)
    vals = np.stack([data.canonical().values] * 3)
    with capture(Record()) as rec:
        res = BatchCg(max_iterations=100, tolerance=1e-8).solve(
            BatchCsr.from_data((data, vals)), jnp.ones((3, 25)))
    assert bool(res.converged.all())
    evts = [d for e, d in rec.data if e == "batch_solve_completed"]
    assert len(evts) == 1 and evts[0]["num_systems"] == 3
