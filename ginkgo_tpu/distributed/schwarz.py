"""Additive Schwarz preconditioner (distributed).

Analog of ``include/ginkgo/core/distributed/preconditioner/schwarz.hpp:69``:
M⁻¹ = blockdiag(solve on each part's owned diagonal block), optionally plus
the additive coarse correction P A_c⁻¹ R (``schwarz.hpp:217-227``).

Two execution paths:

* default (no ``local_solver``): exact dense local inverse inside ONE
  ``shard_map`` region with no collectives — pure SPMD, scales with the
  mesh.
* ``local_solver=<factory>``: the per-part operators are generated at
  BUILD time from each part's host-resident diagonal block (so
  host-symbolic factories — Ilu, Ic, Direct, trisolves — work), and the
  apply runs each part's program on its slice of the sharded vector.  The
  per-part programs may differ structurally (e.g. different ILU level
  counts), which SPMD cannot express in one program — XLA partitions the
  concatenated applies instead.
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
    local_ops: tuple = ()              # per-part solvers (build-time generated)
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

        if self.local_ops:
            parts = [op._apply(b[p * local:(p + 1) * local])
                     for p, op in enumerate(self.local_ops)]
            y = jnp.concatenate(parts, axis=0)
        else:
            def local_solve(lr, lc, lv, b_loc):
                lr, lc, lv = lr[0], lc[0], lv[0]
                from ..matrix.coo import Coo
                A_loc = Coo(row_idx=lr, col_idx=lc, values=lv,
                            shape=(local, local), nnz=lr.shape[0])
                dense = A_loc.to_dense()
                has_diag = jnp.diagonal(dense) != 0
                dense = dense + jnp.diag(jnp.where(has_diag, 0.0, 1.0)
                                         .astype(dense.dtype))
                from ..ops.gauss_jordan import dense_solve
                return dense_solve(dense.astype(b_loc.dtype), b_loc)

            p2 = PartitionSpec(axis, None)
            y = jax.shard_map(
                local_solve, mesh=A.mesh,
                in_specs=(p2, p2, p2, p2),
                out_specs=p2, check_vma=False)(
                A.loc_rows, A.loc_cols, A.loc_vals, b)
        if self.coarse_solve is not None:
            # additive two-level correction: y += P A_c^{-1} R b
            rc = self.coarse_restrict._apply(b)
            yc = self.coarse_solve._apply(rc)
            y = y + self.coarse_prolong._apply(yc)
        return y


class Schwarz:
    """Factory: ``Schwarz(local_solver=..., coarse_level=...,
    coarse_solver=...).generate(dist_A)``.

    ``local_solver``: any solver/preconditioner factory — generated per
    part at build time (host-symbolic factories like Ilu work);
    ``coarse_level``: a coarsening factory (e.g. DistributedPgm()) enabling
    the two-level additive correction;
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
        local_ops = ()
        if self.local_solver is not None:
            from ..matrix.coo import Coo
            lr = np.asarray(A.loc_rows)
            lc = np.asarray(A.loc_cols)
            lv = np.asarray(A.loc_vals)
            local = A.local_size
            ops = []
            for p in range(A.num_parts):
                keep = lr[p] < local
                rows = np.where(keep, lr[p], local)
                coo = Coo(row_idx=jnp.asarray(rows, jnp.int32),
                          col_idx=jnp.asarray(lc[p], jnp.int32),
                          values=jnp.asarray(np.where(keep, lv[p], 0)),
                          shape=(local, local), nnz=int(keep.sum()))
                ops.append(self.local_solver.generate(coo))
            local_ops = tuple(ops)
        cr = cp = cs = None
        if self.coarse_level is not None:
            lvl = self.coarse_level.generate(A)
            cr, cp = lvl.restrict, lvl.prolong
            if self.coarse_solver is not None:
                cs = self.coarse_solver.generate(lvl.coarse_op)
            else:
                from ..solver.multigrid import _DenseCoarseSolver
                cs = _DenseCoarseSolver(inv=jnp.asarray(
                    np.linalg.inv(np.asarray(lvl.coarse_op.to_dense()))))
        return SchwarzOp(A=A, local_ops=local_ops,
                         coarse_restrict=cr, coarse_prolong=cp,
                         coarse_solve=cs)