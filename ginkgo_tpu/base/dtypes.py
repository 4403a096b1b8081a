"""Value/index type machinery.

TPU-native analog of Ginkgo's precision infrastructure
(``include/ginkgo/core/base/types.hpp:459-476``, ``half.hpp``, ``bfloat16.hpp``):
the reference instantiates every kernel for {f16, bf16, f32, f64} x {real, complex};
here every routine is dtype-generic and these helpers centralise the per-precision
tolerances (``core/test/utils.hpp`` ``r<value_type>::value``) and promotion rules.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The value types the framework is instantiated/tested for, mirroring
# GKO_INSTANTIATE_FOR_EACH_VALUE_TYPE.  f64/c128 require jax_enable_x64
# (reference-tier / CPU oracle); the TPU tier is f32/bf16-first.
REAL_VALUE_TYPES = (jnp.bfloat16, jnp.float16, jnp.float32, jnp.float64)
COMPLEX_VALUE_TYPES = (jnp.complex64, jnp.complex128)
VALUE_TYPES = REAL_VALUE_TYPES + COMPLEX_VALUE_TYPES
INDEX_TYPES = (jnp.int32, jnp.int64)

DEFAULT_INDEX = jnp.int32


def is_complex(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def real_dtype(dtype):
    """The real counterpart of a value type (f32 for c64, etc.)."""
    return jnp.finfo(jnp.dtype(dtype)).dtype if not is_complex(dtype) else (
        jnp.float32 if jnp.dtype(dtype) == jnp.complex64 else jnp.float64)


def complex_dtype(dtype):
    d = jnp.dtype(dtype)
    if is_complex(d):
        return d
    return jnp.complex64 if d in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
                                  jnp.dtype(jnp.float16)) else jnp.complex128


def eps(dtype) -> float:
    """Machine epsilon of the *real* part of the value type."""
    return float(jnp.finfo(real_dtype(dtype)).eps)


def reduction_factor(dtype) -> float:
    """Ginkgo's per-precision test tolerance ``r<value_type>::value``
    (reference/test/* use sqrt-ish multiples of eps)."""
    return float(np.sqrt(eps(dtype)) * 2)


def reduce_precision(dtype):
    """One step down Ginkgo's precision ladder (f64->f32->bf16),
    used by adaptive block-Jacobi storage and CB-GMRES."""
    d = jnp.dtype(dtype)
    ladder = {
        jnp.dtype(jnp.float64): jnp.float32,
        jnp.dtype(jnp.float32): jnp.bfloat16,
        jnp.dtype(jnp.bfloat16): jnp.bfloat16,
        jnp.dtype(jnp.float16): jnp.float16,
        jnp.dtype(jnp.complex128): jnp.complex64,
        jnp.dtype(jnp.complex64): jnp.complex64,
    }
    return ladder[d]


def promote(*dtypes):
    return jnp.result_type(*dtypes)
