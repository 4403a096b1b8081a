"""Generate-path stage accounting: device compute vs host<->device
transfer vs host symbolics.

The reference's benchmarks break solve phases into per-stage
``components`` objects (``benchmark/solver/solver_common.hpp:481-484``);
this is the analog for *generate* paths, motivated by an environment
artifact: the single-chip axon tunnel moves arrays at ~10-16 MB/s, so a
wall-clock `generate` number conflates a ~0.5 s device algorithm with
seconds of transfer that no real deployment pays.  Library code brackets
its phases with :func:`stage`; when nothing is collecting, the brackets
are free (no sync points are added).

Usage (benchmark side)::

    with stagetimer.collect() as st:
        M = factory.generate(A)
    st.stages  # {'transfer': 6.1, 'device': 0.49}  (host = rest)

Library side::

    with stagetimer.stage('transfer'):
        AV = stagetimer.sync(jnp.asarray(big_host_array))
    with stagetimer.stage('device'):
        out = stagetimer.sync(jitted_loop(AV))
"""

from __future__ import annotations

import contextlib
import time

_active = None


class Collector:
    def __init__(self):
        self.stages: dict[str, float] = {}

    def add(self, name: str, seconds: float):
        self.stages[name] = self.stages.get(name, 0.0) + seconds


@contextlib.contextmanager
def collect():
    """Install a collector; yields it. Reentrant (inner collectors shadow
    outer ones for their extent)."""
    global _active
    prev, _active = _active, Collector()
    try:
        yield _active
    finally:
        _active = prev


def active() -> bool:
    return _active is not None


@contextlib.contextmanager
def stage(name: str):
    """Attribute the block's wall time to ``name`` when collecting; free
    otherwise.  The block should end with :func:`sync` on its device
    values, or the async dispatch leaks into the next stage."""
    if _active is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _active.add(name, time.perf_counter() - t0)


def sync(x):
    """block_until_ready(x) when collecting (stage-boundary sync point);
    identity otherwise — production paths keep full async dispatch."""
    if _active is not None:
        import jax
        jax.block_until_ready(x)
    return x
