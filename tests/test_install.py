"""Packaging/install gate (reference test/test_install analog,
SURVEY.md §4 row 7): build + install the package from pyproject.toml
into a scratch target (no network, no deps, no build isolation) and
drive a solve from OUTSIDE the repo tree — catches missing package
modules, broken package-data (the self-building native C++ sources),
and repo-path-relative imports."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
assert not any(p.rstrip('/').endswith('repo') for p in sys.path), sys.path
import jax
jax.config.update('jax_platforms', 'cpu')
import ginkgo_tpu as gt
assert {target!r} in gt.__file__, gt.__file__
import jax.numpy as jnp, numpy as np
from ginkgo_tpu.utils.generators import stencil_3d
from ginkgo_tpu.solver import Cg
from ginkgo_tpu.preconditioner.jacobi import Jacobi
A = gt.Csr.from_data(stencil_3d(6, points=7))
r = Cg.solve(A, jnp.ones(216), preconditioner=Jacobi())
assert bool(np.asarray(r.converged).all())
from ginkgo_tpu.config import parse
f = parse({{"type": "solver::Cg", "criteria": [
    {{"type": "stop::Iteration", "max_iters": 50}}]}})
f.generate(A).apply(jnp.ones(216))
print("INSTALL-GATE-OK")
"""


def test_pip_install_and_drive(tmp_path):
    target = str(tmp_path / "site")
    try:
        subprocess.run(
            [sys.executable, "-m", "pip", "install", "--no-deps",
             "--no-build-isolation", "--no-index", "--quiet",
             "-t", target, REPO],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"pip unavailable in this environment: {e}")
    env = dict(os.environ, PYTHONPATH=target)
    out = subprocess.run(
        [sys.executable, "-c", DRIVER.format(target=target)],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "INSTALL-GATE-OK" in out.stdout
