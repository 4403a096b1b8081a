"""Accessors — storage/arithmetic precision decoupling.

Analog of Ginkgo's ``accessor/`` templates (``reduced_row_major.hpp``,
``scaled_reduced_row_major.hpp``, ``range.hpp``): arrays stored at a lower
precision (or scaled integers) but *read and written* in a higher arithmetic
type.  On TPU this is the quantise/dequantise pair around an HBM buffer —
storage traffic halves/quarters while the VPU/MXU compute stays in the
arithmetic dtype (the CB-GMRES basis trick, used library-wide).
"""

from __future__ import annotations

import jax.numpy as jnp

from .linop import linop_dataclass, static_field


@linop_dataclass
class ReducedRowMajor:
    """Plain down-converted storage: read() upcasts, write() downcasts."""

    storage: jnp.ndarray
    arith_dtype: object = static_field(default=jnp.float32)

    @classmethod
    def create(cls, shape, storage_dtype, arith_dtype=jnp.float32):
        return cls(storage=jnp.zeros(shape, storage_dtype),
                   arith_dtype=arith_dtype)

    @classmethod
    def from_array(cls, arr, storage_dtype):
        return cls(storage=jnp.asarray(arr, storage_dtype),
                   arith_dtype=jnp.asarray(arr).dtype)

    @property
    def shape(self):
        return self.storage.shape

    def read(self, idx=None):
        s = self.storage if idx is None else self.storage[idx]
        return s.astype(self.arith_dtype)

    def write(self, idx, value):
        return ReducedRowMajor(
            storage=self.storage.at[idx].set(
                value.astype(self.storage.dtype)),
            arith_dtype=self.arith_dtype)


@linop_dataclass
class ScaledReducedRowMajor:
    """Scaled integer storage: value = scale[row-block] * q.  The scale is
    per leading index (Ginkgo's stride mask 0b101 layout)."""

    q: jnp.ndarray            # integer storage
    scale: jnp.ndarray        # (leading_dim,) arithmetic dtype
    arith_dtype: object = static_field(default=jnp.float32)

    @classmethod
    def create(cls, shape, int_dtype=jnp.int16, arith_dtype=jnp.float32):
        return cls(q=jnp.zeros(shape, int_dtype),
                   scale=jnp.ones((shape[0],), arith_dtype),
                   arith_dtype=arith_dtype)

    @property
    def shape(self):
        return self.q.shape

    @property
    def _qmax(self):
        return float(jnp.iinfo(self.q.dtype).max - 1)

    def read(self, i=None):
        if i is None:
            sc = self.scale.reshape((-1,) + (1,) * (self.q.ndim - 1))
            return self.q.astype(self.arith_dtype) * sc.astype(
                self.arith_dtype)
        return (self.q[i].astype(self.arith_dtype)
                * self.scale[i].astype(self.arith_dtype))

    def write(self, i, value):
        """Write one leading-index slice, choosing its scale from |max|."""
        amax = jnp.max(jnp.abs(value))
        scale = jnp.where(amax == 0, jnp.ones_like(amax),
                          amax / self._qmax)
        qv = jnp.clip(jnp.round(value / scale), -self._qmax,
                      self._qmax).astype(self.q.dtype)
        return ScaledReducedRowMajor(
            q=self.q.at[i].set(qv),
            scale=self.scale.at[i].set(scale.astype(self.scale.dtype)),
            arith_dtype=self.arith_dtype)
