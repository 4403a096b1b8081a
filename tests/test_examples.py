"""Run every example and assert its verification dict (examples/ = the
acceptance checklist, SURVEY.md Appendix B; reference examples print
verified residuals, e.g. examples/simple-solver/simple-solver.cpp:122-140).

Contract: ``main()`` returns a non-empty dict of metrics.  Every key ``X``
with a matching ``X_bound`` is asserted ``X <= X_bound`` (and ``X_low`` /
``X_high`` bracket checks); a ``converged`` key must be truthy.  A broken
solver therefore fails these tests on numerics, not just on crashes.
"""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py"))
EXAMPLES = [p for p in EXAMPLES if p.stem != "_example_setup"]


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example(path):
    spec = importlib.util.spec_from_file_location(f"ex_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main"), f"{path.stem} must define main()"
        out = mod.main()
        assert isinstance(out, dict) and out, (
            f"{path.stem}.main() must return its verification dict")
        checks = 0
        if "converged" in out:
            assert out["converged"], f"{path.stem}: not converged"
            checks += 1
        for key, value in out.items():
            if f"{key}_bound" in out:
                assert value <= out[f"{key}_bound"], (
                    f"{path.stem}: {key}={value} exceeds bound "
                    f"{out[f'{key}_bound']}")
                checks += 1
            if f"{key}_low" in out and f"{key}_high" in out:
                assert out[f"{key}_low"] < value < out[f"{key}_high"], (
                    f"{path.stem}: {key}={value} outside "
                    f"({out[f'{key}_low']}, {out[f'{key}_high']})")
                checks += 1
        assert checks >= 1, f"{path.stem}: dict carries no checkable metric"
    finally:
        sys.modules.pop(spec.name, None)
