"""Persistent compilation cache wiring (utils/compile_cache.py)."""

import os

import jax
import numpy as np

import ginkgo_tpu as gt
from ginkgo_tpu.utils.compile_cache import enable_compilation_cache


def test_enable_is_idempotent_and_sets_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("GINKGO_TPU_CACHE_DIR", str(tmp_path / "xla"))
    import ginkgo_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "_enabled", False)
    p1 = enable_compilation_cache()
    p2 = enable_compilation_cache()
    assert p1 == p2 and p1.endswith("xla")
    assert jax.config.jax_compilation_cache_dir == p1


def test_opt_out(monkeypatch):
    monkeypatch.setenv("GINKGO_TPU_NO_COMPILE_CACHE", "1")
    import ginkgo_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "_enabled", False)
    assert enable_compilation_cache() is None


def test_cache_writes_an_executable(tmp_path, monkeypatch):
    """A slow-enough compile must land in the cache directory (the
    GMRES cold-start fix; threshold dropped for test speed)."""
    monkeypatch.setenv("GINKGO_TPU_CACHE_DIR", str(tmp_path / "xla"))
    import ginkgo_tpu.utils.compile_cache as cc
    monkeypatch.setattr(cc, "_enabled", False)
    path = enable_compilation_cache()
    # jax pins the cache backend at first use; earlier tests in the
    # session may already have initialized it at another directory.
    from jax._src import compilation_cache as jax_cc
    jax_cc.reset_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.01)
    try:
        import jax.numpy as jnp

        def body(i, x):
            return jnp.sin(x) + jnp.cos(x) * 1.0001

        f = jax.jit(lambda x: jax.lax.fori_loop(0, 64, body, x) @ x.T)
        f(jnp.ones((128, 128), jnp.float32)).block_until_ready()
        assert len(os.listdir(path)) >= 1
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
        jax_cc.reset_cache()
