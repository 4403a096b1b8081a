"""Persistent XLA compilation cache — the GMRES/GCR cold-start fix.

The deeply nested while_loop solvers (GMRES' restart-over-Arnoldi
structure) cost minutes of XLA/Mosaic compile time on the TPU backend
the FIRST time a (shape, dtype, krylov_dim) configuration is seen.  The
reference has no such cliff (C++ kernels are AOT); the TPU-native
answer is JAX's persistent compilation cache: compiled executables are
stored on disk keyed by the HLO hash, so every process after the first
loads the binary in seconds.  ``utils/export.py`` remains the
cross-machine serving path (StableHLO artifacts); this cache is the
same-machine developer/production path and needs no API change.

Enabled automatically on first solver use (see solver/common.py) unless
``GINKGO_TPU_NO_COMPILE_CACHE`` is set.  Cache location:
``$GINKGO_TPU_CACHE_DIR`` or ``~/.cache/ginkgo_tpu/xla``.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (default ``$GINKGO_TPU_CACHE_DIR`` or ``~/.cache/ginkgo_tpu/xla``).
    Returns the directory, or None when disabled via env."""
    global _enabled
    if os.environ.get("GINKGO_TPU_NO_COMPILE_CACHE"):
        return None
    import jax
    if path is None:
        path = os.environ.get("GINKGO_TPU_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "ginkgo_tpu", "xla")
    if _enabled:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # only cache expensive compiles (the solver cliff), not every
        # tiny jitted helper; cache regardless of entry size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    except Exception:                      # pragma: no cover - jax version
        return None
    return path
