"""Distributed Vector.

Analog of ``include/ginkgo/core/distributed/vector.hpp`` /
``core/distributed/vector.cpp:473-491``: a row-partitioned multivector whose
BLAS-1 reductions are global.  Under GSPMD the underlying array is simply a
sharded global array — jnp reductions compile to local reduce + psum — so
this class is a *view* carrying the Partition (for natural<->padded layout
conversion) rather than a communication engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import linop_dataclass, static_field
from ..matrix.dense import (compute_conj_dot, compute_dot, compute_norm1,
                            compute_norm2)
from .partition import Partition


@linop_dataclass
class Vector:
    """Row-distributed multivector: padded sharded array + partition."""

    array: jnp.ndarray                       # (padded_size,) or (padded, k)
    partition: object = static_field(default=None)

    @classmethod
    def from_global(cls, x, partition: Partition, mesh, axis="rows"):
        from .matrix import distribute_vector
        return cls(array=distribute_vector(x, partition, mesh, axis),
                   partition=partition)

    def to_global(self) -> np.ndarray:
        return self.partition.from_padded(np.asarray(self.array))

    @property
    def shape(self):
        return self.array.shape

    def _2d(self):
        return self.array[:, None] if self.array.ndim == 1 else self.array

    # -- global BLAS-1 (psum inserted by XLA on sharded arrays) --------------
    def compute_dot(self, other):
        return compute_dot(self._2d(), other._2d())

    def compute_conj_dot(self, other):
        return compute_conj_dot(self._2d(), other._2d())

    def compute_norm2(self):
        return compute_norm2(self._2d())

    def compute_norm1(self):
        return compute_norm1(self._2d())

    def scale(self, alpha):
        return Vector(array=self.array * alpha, partition=self.partition)

    def add_scaled(self, alpha, other):
        return Vector(array=self.array + alpha * other.array,
                      partition=self.partition)

    def create_subvector(self, cols):
        """Column-subset view (the reference v1.11's non-owning distributed
        sub-vector): rows stay sharded, columns are replicated so slicing
        preserves the sharding."""
        return Vector(array=self._2d()[:, cols], partition=self.partition)

    def local_view(self, rank: int):
        """This rank's rows (host-side convenience)."""
        local = self.partition.local_size
        real = int(self.partition.part_sizes()[rank])
        return np.asarray(self.array)[rank * local:rank * local + real]
