"""Precision dispatch and version info.

Analogs of ``include/ginkgo/core/base/precision_dispatch.hpp``
(``precision_dispatch_real_complex``: convert user vectors to the solver's
value type, solve, convert back) and ``version.hpp:132`` (version_info).
"""

from __future__ import annotations

import jax.numpy as jnp

from .dtypes import is_complex, real_dtype


def precision_dispatch(solve_fn, A, b, *args, **kwargs):
    """Run ``solve_fn(A, b_converted, ...)`` with b converted to A's value
    type, and return the result converted back to b's dtype — the
    temporary_conversion mechanism that lets an f32 solver accept f64
    vectors (used at every solver apply boundary in the reference,
    ``core/solver/cg.cpp:84``)."""
    b = jnp.asarray(b)
    target = A.dtype
    res = solve_fn(A, b.astype(target), *args, **kwargs)
    if hasattr(res, "x"):
        import dataclasses
        return dataclasses.replace(res, x=res.x.astype(b.dtype))
    return res.astype(b.dtype)


def precision_dispatch_real_complex(solve_fn, A, b, *args, **kwargs):
    """Additionally handles complex b over a real operator by solving the
    real and imaginary parts as a 2-column multivector
    (``precision_dispatch_real_complex`` analog)."""
    b = jnp.asarray(b)
    if is_complex(b.dtype) and not is_complex(A.dtype):
        stacked = jnp.concatenate(
            [jnp.real(b)[..., None] if b.ndim == 1 else jnp.real(b),
             jnp.imag(b)[..., None] if b.ndim == 1 else jnp.imag(b)],
            axis=1)
        res = solve_fn(A, stacked.astype(A.dtype), *args, **kwargs)
        k = stacked.shape[1] // 2
        x = res.x[:, :k] + 1j * res.x[:, k:]
        import dataclasses
        return dataclasses.replace(
            res, x=(x[:, 0] if b.ndim == 1 else x).astype(b.dtype))
    return precision_dispatch(solve_fn, A, b, *args, **kwargs)


class version_info:
    """``gko::version_info::get()`` analog."""

    @staticmethod
    def get():
        from .. import __version__
        import jax
        return {
            "ginkgo_tpu": __version__,
            "jax": jax.__version__,
            "backend": jax.default_backend(),
            "tiers": {"reference": "jax.numpy", "tpu": "pallas",
                      "host": "c++ (native/)"},
        }
