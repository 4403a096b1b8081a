"""Additive Schwarz preconditioner (distributed).

Analog of ``include/ginkgo/core/distributed/preconditioner/schwarz.hpp:69``:
M⁻¹ = blockdiag(solve on each part's owned diagonal block).  SPMD mapping:
the per-rank local solve becomes a ``shard_map`` region with NO collectives
inside — each shard runs its local solver independently (vmap-identical
program, device-local trip counts), which is exactly Ginkgo's
local-solver-per-rank semantics.

``local_solver``: any solver factory from this library (default: exact dense
inverse of the local block — fine for moderate local sizes; pass e.g.
``Cg.build(criteria=Iteration(10))`` or ``LowerTrs``-based ILU for scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from ..base.linop import LinOp, linop_dataclass, static_field
from .matrix import DistributedMatrix


@linop_dataclass
class SchwarzOp(LinOp):
    A: DistributedMatrix
    local_factory: object = static_field(default=None)
    coarse_restrict: object = None     # two-level correction (optional)
    coarse_prolong: object = None
    coarse_solve: object = None

    @property
    def shape(self):
        return self.A.shape

    def _apply(self, b):
        A = self.A
        local = A.local_size
        axis = A.axis
        factory = self.local_factory

        def local_solve(lr, lc, lv, b_loc):
            lr, lc, lv = lr[0], lc[0], lv[0]
            from ..matrix.coo import Coo
            A_loc = Coo(row_idx=lr, col_idx=lc, values=lv,
                        shape=(local, local), nnz=lr.shape[0])
            if factory is None:
                # dense local inverse (padded rows get unit diagonal)
                dense = A_loc.to_dense()
                has_diag = jnp.diagonal(dense) != 0
                dense = dense + jnp.diag(jnp.where(has_diag, 0.0, 1.0)
                                         .astype(dense.dtype))
                return jnp.linalg.solve(dense.astype(b_loc.dtype), b_loc)
            op = factory.generate(A_loc)
            return op._apply(b_loc)

        p2 = PartitionSpec(axis, None)
        y = jax.shard_map(
            local_solve, mesh=A.mesh,
            in_specs=(p2, p2, p2, p2),
            out_specs=p2, check_vma=False)(
            A.loc_rows, A.loc_cols, A.loc_vals, b)
        if self.coarse_solve is not None:
            # additive two-level correction: y += P A_c^{-1} R b
            # (schwarz.hpp:217-227 coarse_level/coarse_solver)
            rc = self.coarse_restrict._apply(b)
            yc = self.coarse_solve._apply(rc)
            y = y + self.coarse_prolong._apply(yc)
        return y


class Schwarz:
    """Factory: ``Schwarz(local_solver=..., coarse_level=...,
    coarse_solver=...).generate(dist_A)``.

    ``coarse_level``: a coarsening factory (e.g. DistributedPgm()) enabling
    the two-level additive correction of schwarz.hpp:217-227;
    ``coarse_solver``: factory for the coarse system (dense inverse default).
    """

    def __init__(self, local_solver=None, coarse_level=None,
                 coarse_solver=None):
        self.local_solver = local_solver
        self.coarse_level = coarse_level
        self.coarse_solver = coarse_solver

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A: DistributedMatrix) -> SchwarzOp:
        cr = cp = cs = None
        if self.coarse_level is not None:
            lvl = self.coarse_level.generate(A)
            cr, cp = lvl.restrict, lvl.prolong
            if self.coarse_solver is not None:
                cs = self.coarse_solver.generate(lvl.coarse_op)
            else:
                import numpy as np
                from ..solver.multigrid import _DenseCoarseSolver
                cs = _DenseCoarseSolver(inv=jnp.asarray(
                    np.linalg.inv(np.asarray(lvl.coarse_op.to_dense()))))
        return SchwarzOp(A=A, local_factory=self.local_solver,
                         coarse_restrict=cr, coarse_prolong=cp,
                         coarse_solve=cs)
