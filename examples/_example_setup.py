"""Shared example bootstrap: repo root on sys.path (already done by the
two-liner in each example before this import resolves) and f64 numerics —
the examples' tolerances assume reference-parity double precision, which
the TPU platform supports.  Policy changes go here, once."""

import jax

jax.config.update("jax_enable_x64", True)
