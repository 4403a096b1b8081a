"""Two-tier kernel backend registry.

The moral equivalent of Ginkgo's ``GKO_REGISTER_OPERATION`` +
``Executor::run`` double dispatch (``include/ginkgo/core/base/executor.hpp:419-439``)
collapsed to what a TPU stack needs: a ``reference`` tier (pure jax.numpy —
runs anywhere, is the numerical oracle, mirrors Ginkgo's ``reference/``
backend) and a ``tpu`` tier (Pallas kernels).  Kernels register per-name
implementations; resolution order is explicit override > default-device
heuristic.
"""

from __future__ import annotations

import contextlib
import threading

import jax

_kernels: dict[str, dict[str, object]] = {}
_local = threading.local()


def register(name: str, tier: str):
    """Decorator: register ``fn`` as the ``tier`` implementation of ``name``."""

    def deco(fn):
        _kernels.setdefault(name, {})[tier] = fn
        return fn

    return deco


def current_tier() -> str:
    override = getattr(_local, "tier", None)
    if override is not None:
        return override
    return "tpu" if jax.default_backend() in ("tpu", "axon") else "reference"


@contextlib.contextmanager
def use_tier(tier: str):
    """Force a tier (e.g. ``reference`` for oracle runs) within a scope."""
    prev = getattr(_local, "tier", None)
    _local.tier = tier
    try:
        yield
    finally:
        _local.tier = prev


def lookup(name: str):
    """Resolve a kernel: preferred tier if registered, else reference."""
    impls = _kernels.get(name)
    if not impls:
        raise KeyError(f"no kernel registered under {name!r}")
    tier = current_tier()
    return impls.get(tier) or impls["reference"]
