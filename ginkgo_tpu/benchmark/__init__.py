"""Benchmark suite (benchmark/ analogs) — run via
``python -m ginkgo_tpu.benchmark <suite>``."""
