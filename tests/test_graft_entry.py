"""Driver entry points (__graft_entry__.py): the single-chip compile
check and the multi-device dryrun the round driver executes — kept
under test so entry regressions are caught before the driver runs."""

import importlib.util
import os

import jax
import pytest


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles():
    mod = _load()
    fn, args = mod.entry()
    jax.jit(fn).lower(*args)


@pytest.mark.slow
def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(min(8, len(jax.devices())))
