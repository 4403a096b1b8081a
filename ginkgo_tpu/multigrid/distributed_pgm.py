"""PGM coarsening for distributed operators.

Analog of the distributed PGM path (``core/multigrid/pgm.cpp`` map_to_global
/ map_col, test/mpi/multigrid/pgm.cpp): the finest level stays sharded (its
smoother and SpMV run distributed); coarse grids — small by construction —
are *replicated*, the standard practice for AMG hierarchies on accelerator
meshes.  Restriction gathers the padded sharded residual into natural row
order and segment-sums by aggregate; prolongation scatters back into the
padded sharded layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..distributed.matrix import DistributedMatrix
from ..matrix.csr import Csr
from .pgm import MultigridLevel, Pgm, galerkin_coarse, pgm_aggregate


@linop_dataclass
class _DistRestrict(LinOp):
    """r_coarse(replicated) = segment_sum(r_padded[slots], agg)."""

    slots: jnp.ndarray       # (n,) padded slot of natural row i
    agg: jnp.ndarray         # (n,) aggregate of natural row i
    num_coarse: int = static_field()
    n_pad: int = static_field()

    @property
    def shape(self):
        return (self.num_coarse, self.n_pad)

    def _apply(self, b):
        r_nat = b[self.slots]
        return jax.ops.segment_sum(r_nat, self.agg,
                                   num_segments=self.num_coarse)


@linop_dataclass
class _DistProlong(LinOp):
    """x_padded(sharded) = scatter(x_coarse[agg], slots)."""

    slots: jnp.ndarray
    agg: jnp.ndarray
    num_coarse: int = static_field()
    n_pad: int = static_field()

    @property
    def shape(self):
        return (self.n_pad, self.num_coarse)

    def _apply(self, b):
        x_nat = b[self.agg]                     # (n, k)
        return jnp.zeros((self.n_pad, b.shape[1]), b.dtype).at[
            self.slots].set(x_nat)


class DistributedPgm:
    """Coarsening factory usable as Multigrid's ``mg_level`` for
    DistributedMatrix systems: level 0 bridges sharded->replicated, deeper
    levels delegate to plain PGM."""

    def __init__(self, host_data=None, **pgm_params):
        self.host_data = host_data
        self.inner = Pgm(**pgm_params)
        self.pgm_params = pgm_params

    def generate(self, A) -> MultigridLevel:
        if not isinstance(A, DistributedMatrix):
            return self.inner.generate(A)
        data = self.host_data if self.host_data is not None else \
            getattr(A, "host_data", None)
        if data is None:
            raise ValueError(
                "DistributedPgm needs the host MatrixData (pass host_data= "
                "or build the matrix via read_distributed)")
        d = data.canonical()
        n = d.shape[0]
        part = getattr(A, "host_partition", None)
        if part is None:
            raise ValueError("distributed matrix lacks partition metadata")
        agg = pgm_aggregate(d, **{k: v for k, v in self.pgm_params.items()
                                  if k in ("max_iterations",
                                           "max_unassigned_ratio",
                                           "deterministic")})
        nc = int(agg.max()) + 1 if agg.size else 1
        coarse = Csr.from_data(galerkin_coarse(d, agg, nc),
                               strategy="classical")
        slots = part.padded_slot(np.arange(n))
        return MultigridLevel(
            fine_op=A,
            prolong=_DistProlong(slots=jnp.asarray(slots, jnp.int32),
                                 agg=jnp.asarray(agg, jnp.int32),
                                 num_coarse=nc, n_pad=part.padded_size),
            restrict=_DistRestrict(slots=jnp.asarray(slots, jnp.int32),
                                   agg=jnp.asarray(agg, jnp.int32),
                                   num_coarse=nc, n_pad=part.padded_size),
            coarse_op=coarse)
