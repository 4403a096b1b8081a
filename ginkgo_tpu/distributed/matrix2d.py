"""2-D (rows x cols) block-distributed operator — beyond-parity scaling.

The reference distributes matrices one way only: a 1-D row partition with
halo exchange (``core/distributed/matrix.cpp``), which `matrix.py` maps to
a 1-D mesh.  That is optimal for banded/stencil matrices (tiny halos) but
its halo volume grows with the matrix bandwidth.  This module adds the
standard 2-D decomposition from the TPU scaling playbook: a
``Mesh(("rows", "cols"))`` where device (i, j) owns block A[i, j], the
input vector is sharded over the "cols" axis, each device computes its
block's partial product, and a ``psum`` over "cols" produces the
row-sharded result.  Per apply, communication is one reduce over the Pc
mesh columns plus XLA's automatic row<->col reshard between iterations —
independent of matrix bandwidth, so wide/unstructured coupling scales
where 1-D halos would not.

Vectors are plain (n_pad, k) sharded arrays, so every solver runs
through this operator unchanged (XLA inserts psum for dots and the
reshard collective at the shard_map boundary).

Requirements: square operator, the same Partition for rows and columns
(the common solver case — general rectangular row/col partitions work by
passing ``col_partition``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData
from .partition import Partition


@linop_dataclass
class DistributedMatrix2D(LinOp):
    """Block COO storage: (Pr, Pc, cap) index/value arrays, device (i, j)
    owning slice [i, j] (pad slots carry row == local_nr, dropped by the
    scatter)."""

    blk_rows: jnp.ndarray    # (Pr, Pc, cap) int32 local row indices
    blk_cols: jnp.ndarray    # (Pr, Pc, cap) int32 local col indices
    blk_vals: jnp.ndarray    # (Pr, Pc, cap)
    # like the 1-D DistributedMatrix, ``shape`` is the PADDED shape the
    # sharded vectors actually have (Pr*local_nr, Pc*local_nc); the
    # original matrix dimensions live in ``global_shape``
    shape: tuple = static_field()
    global_shape: tuple = static_field()
    local_nr: int = static_field()
    local_nc: int = static_field()
    mesh: object = static_field(default=None)
    row_partition: object = static_field(default=None)
    col_partition: object = static_field(default=None)

    @property
    def grid(self):
        return self.blk_vals.shape[0], self.blk_vals.shape[1]

    def _apply(self, b):
        from ..ops.registry import lookup
        spmv = lookup("coo_spmv")
        local_nr = self.local_nr

        def body(lr, lc, lv, b_loc):
            # lr/lc/lv arrive as (1, 1, cap); b_loc as (local_nc, k)
            y = spmv(lr[0, 0], lc[0, 0], lv[0, 0], b_loc, local_nr)
            return jax.lax.psum(y, "cols")

        P = PartitionSpec
        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P("rows", "cols", None), P("rows", "cols", None),
                      P("rows", "cols", None), P("cols", None)),
            out_specs=P("rows", None))(
            self.blk_rows, self.blk_cols, self.blk_vals, b)

    def to_dense(self):
        """Gather to one dense (n, m) array in NATURAL (unpadded) row/col
        order — pad slots sit at the end of each part, so the natural rows
        are selected through the partitions' padded_slot maps."""
        Pr, Pc = self.grid
        n, m = self.global_shape
        out = np.zeros((Pr * self.local_nr, Pc * self.local_nc),
                       np.asarray(self.blk_vals).dtype)
        br = np.asarray(self.blk_rows)
        bc = np.asarray(self.blk_cols)
        bv = np.asarray(self.blk_vals)
        for i in range(Pr):
            for j in range(Pc):
                keep = br[i, j] < self.local_nr
                out[i * self.local_nr + br[i, j][keep],
                    j * self.local_nc + bc[i, j][keep]] += bv[i, j][keep]
        rs = self.row_partition.padded_slot(np.arange(n))
        cs = self.col_partition.padded_slot(np.arange(m))
        return jnp.asarray(out[np.ix_(rs, cs)])

    @classmethod
    def from_data(cls, data: MatrixData, row_partition: Partition,
                  mesh: Mesh, col_partition: Partition = None,
                  dtype=None, pad_multiple: int = 8):
        """Split the COO entries into the (Pr, Pc) block grid of the mesh.

        ``mesh`` must have axes ("rows", "cols") with sizes matching the
        partitions' num_parts."""
        if col_partition is None:
            col_partition = row_partition
        d = data.canonical()
        Pr = row_partition.num_parts
        Pc = col_partition.num_parts
        from ..base.exceptions import ValueMismatch
        if dict(zip(mesh.axis_names, mesh.devices.shape)) != {
                "rows": Pr, "cols": Pc}:
            raise ValueMismatch(
                f"mesh axes {dict(zip(mesh.axis_names, mesh.devices.shape))}"
                f" must be {{'rows': {Pr}, 'cols': {Pc}}}")
        if (d.shape[0] == d.shape[1]
                and row_partition.padded_size != col_partition.padded_size):
            raise ValueMismatch(
                "square operator needs matching padded sizes for the row "
                f"and column partitions (got {row_partition.padded_size} vs "
                f"{col_partition.padded_size}); pick Pr/Pc so that "
                "ceil(n/Pr)*Pr == ceil(n/Pc)*Pc, e.g. powers of two")
        vals = d.values if dtype is None else d.values.astype(dtype)
        local_nr = row_partition.local_size
        local_nc = col_partition.local_size
        bi = row_partition.owner_of(d.row_idx)
        bj = col_partition.owner_of(d.col_idx)
        lr = d.row_idx - row_partition.ranges[bi]
        lc = d.col_idx - col_partition.ranges[bj]
        flat = bi * Pc + bj
        order = np.argsort(flat, kind="stable")
        counts = np.bincount(flat, minlength=Pr * Pc)
        cap = max(int(counts.max()), 1)
        cap = -(-cap // pad_multiple) * pad_multiple
        BR = np.full((Pr * Pc, cap), local_nr, np.int64)
        BC = np.zeros((Pr * Pc, cap), np.int64)
        BV = np.zeros((Pr * Pc, cap), vals.dtype)
        offs = np.concatenate([[0], np.cumsum(counts)])
        lr_s, lc_s, v_s = lr[order], lc[order], vals[order]
        for blk in range(Pr * Pc):
            s, e = offs[blk], offs[blk + 1]
            BR[blk, :e - s] = lr_s[s:e]
            BC[blk, :e - s] = lc_s[s:e]
            BV[blk, :e - s] = v_s[s:e]
        P = PartitionSpec
        sh = NamedSharding(mesh, P("rows", "cols", None))
        return cls(
            blk_rows=jax.device_put(
                jnp.asarray(BR.reshape(Pr, Pc, cap), jnp.int32), sh),
            blk_cols=jax.device_put(
                jnp.asarray(BC.reshape(Pr, Pc, cap), jnp.int32), sh),
            blk_vals=jax.device_put(jnp.asarray(BV.reshape(Pr, Pc, cap)), sh),
            shape=(Pr * local_nr, Pc * local_nc), global_shape=d.shape,
            local_nr=local_nr, local_nc=local_nc, mesh=mesh,
            row_partition=row_partition, col_partition=col_partition)


def read_distributed_2d(data: MatrixData, row_partition: Partition,
                        mesh: Mesh, **kw) -> DistributedMatrix2D:
    return DistributedMatrix2D.from_data(data, row_partition, mesh, **kw)


def distribute_vector_2d(x, partition: Partition, mesh: Mesh,
                         axis: str = "rows"):
    """Natural (global_size[, k]) host vector -> padded array sharded over
    one mesh axis (replicated over the other)."""
    xp = partition.to_padded(np.asarray(x))
    spec = (PartitionSpec(axis) if xp.ndim == 1
            else PartitionSpec(axis, None))
    return jax.device_put(jnp.asarray(xp), NamedSharding(mesh, spec))
