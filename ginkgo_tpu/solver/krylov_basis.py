"""Krylov basis / direction-buffer storage accessors.

Shared by GMRES (Krylov basis, incl. the CB-GMRES compressed-storage
variants — ``core/solver/cb_gmres_accessor.hpp:56-115``) and GCR (P/Q
direction buffers).  Design rules measured on TPU (see BENCHMARKS.md and
docs/DESIGN.md §5):

* k == 1 state is stored squeezed 2-D — a trailing unit dim makes XLA
  pick degenerate (1, 128)-tiled layouts for the 30+ MB buffer and insert
  full-buffer transpose-copies at control-flow joins;
* writes use ``dynamic_update_slice`` — a traced-index ``.at[i].set``
  scatter lowers to a full-buffer pad+select;
* the column axis is padded to a multiple of the caller's orthogonalisation
  block so j-bounded blocked loops tile it exactly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..base.dtypes import reduce_precision


def _ceil_to(m: int, block: int) -> int:
    return -(-m // block) * block


@functools.lru_cache(maxsize=32)
def _row_write_call(shape, chunk, dtype_name, interpret):
    """Pallas in-place basis-column write: one HBM->HBM DMA of row i
    with the store aliased in/out (input_output_aliases), so XLA cannot
    materialize a full-buffer copy of the Krylov basis per Arnoldi step
    (the dynamic_update_slice path costs ~7 us per ALLOCATED column per
    iteration on chip — see BENCHMARKS.md).

    ``shape`` is the store viewed 2-D with the basis column occupying
    ``chunk`` consecutive rows (a 1-row slice of an (m, n) buffer is not
    a legal Mosaic DMA unit — slices along the sublane dim must be
    8-aligned — so callers bitcast (m, n) -> (m*n/128, 128) with
    chunk = n/128, and (m, n, k) -> (m*n, k) with chunk = n)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(i_ref, row_ref, store_in_ref, out_ref, sem):
        cp = pltpu.make_async_copy(
            row_ref, out_ref.at[pl.ds(i_ref[0] * chunk, chunk)], sem)
        cp.start()
        cp.wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.dtype(dtype_name)),
        input_output_aliases={2: 0},
        interpret=bool(interpret),
    )


def _use_pallas_write(dtype) -> bool:
    """OFF by default after on-chip A/B measurement (v5e, n=262k,
    GMRES(30) in-cycle): the DMA path costs 404 us/iter vs 253 for
    dynamic_update_slice — XLA already updates while-loop carries in
    place, and the (m, n) <-> (m*n/128, 128) reshape around the aliased
    pallas_call is a physical re-tiling copy, not a bitcast.  Kept
    behind GINKGO_TPU_PALLAS_WRITE=1 for future hardware/XLA versions."""
    if not os.environ.get("GINKGO_TPU_PALLAS_WRITE"):
        return False
    if jnp.dtype(dtype).itemsize not in (2, 4):
        return False                       # f64/complex: CPU tier only
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def inplace_row_write(store, i, row, *, interpret=False):
    """store[i] = row via the aliased Pallas DMA (TPU backends), or
    dynamic_update_slice elsewhere.  The DMA path needs an 8-sublane-
    aligned chunk: n % 1024 == 0 for 2-D stores, n % 8 == 0 for 3-D."""
    use = interpret or _use_pallas_write(store.dtype)
    dname = jnp.dtype(store.dtype).name
    row = row.astype(store.dtype)
    if use and store.ndim == 2 and store.shape[1] % 1024 == 0:
        m_pad, n = store.shape
        nr = n // 128
        call = _row_write_call((m_pad * nr, 128), nr, dname, interpret)
        out = call(jnp.asarray([i], jnp.int32), row.reshape(nr, 128),
                   store.reshape(m_pad * nr, 128))
        return out.reshape(m_pad, n)
    if use and store.ndim == 3 and store.shape[1] % 8 == 0:
        m_pad, n, k = store.shape
        call = _row_write_call((m_pad * n, k), n, dname, interpret)
        out = call(jnp.asarray([i], jnp.int32), row,
                   store.reshape(m_pad * n, k))
        return out.reshape(m_pad, n, k)
    return jax.lax.dynamic_update_slice_in_dim(
        store, row[None], i, 0)


class _SqueezeK1:
    """k == 1 pack/unpack between the solver's (n, k) vectors and the
    squeezed 2-D storage."""

    def _pack(self, vec):
        return vec[:, 0] if self.k1 else vec

    def _unpack(self, arr):
        return arr[..., None] if self.k1 else arr


class KrylovBasis(_SqueezeK1):
    """'keep': basis stored at full value-type precision."""

    def __init__(self, m, n, k, dtype, block=1):
        self.m = m
        self.k1 = (k == 1)
        m_pad = _ceil_to(m, block)
        self.shape = (m_pad, n) if self.k1 else (m_pad, n, k)
        self.dtype = dtype

    def empty(self):
        return jnp.zeros(self.shape, self.dtype)

    def write(self, store, i, vec):
        return inplace_row_write(store, i, self._pack(vec))

    def read_all(self, store, dtype):
        return self._unpack(store[:self.m].astype(dtype))

    def read_one(self, store, i, dtype):
        return self._unpack(jax.lax.dynamic_index_in_dim(
            store, i, 0, keepdims=False).astype(dtype))

    def read_block(self, store, start, size, dtype):
        """(size, n, k) columns [start, start+size) — static size, traced
        start; start+size stays in-bounds by construction (padded m)."""
        return self._unpack(jax.lax.dynamic_slice_in_dim(
            store, start, size, 0).astype(dtype))


class ReducedBasis(KrylovBasis):
    """reduce1/reduce2: plain down-converted storage (f64->f32->bf16)."""

    def __init__(self, m, n, k, dtype, steps, block=1):
        store = dtype
        for _ in range(steps):
            store = reduce_precision(store)
        super().__init__(m, n, k, store, block=block)


class ScaledIntBasis(_SqueezeK1):
    """integer: per-vector-scaled integer storage (Ginkgo's scaled
    ``reduced_row_major`` with integer storage, mask 0b101).  'integer'
    maps to int16 (Ginkgo's wider int modes); 'int8' is the aggressive
    quarter-traffic variant."""

    def __init__(self, m, n, k, dtype, int_dtype=jnp.int16, block=1):
        self.m, self.n, self.k = m, n, k
        self.k1 = (k == 1)
        m_pad = _ceil_to(m, block)
        self.shape = (m_pad, n) if self.k1 else (m_pad, n, k)
        self.value_dtype = dtype
        self.int_dtype = int_dtype
        self.qmax = float(jnp.iinfo(int_dtype).max - 1)

    def empty(self):
        return dict(q=jnp.zeros(self.shape, self.int_dtype),
                    scale=jnp.ones((self.shape[0], self.k),
                                   self.value_dtype))

    def write(self, store, i, vec):
        amax = jnp.max(jnp.abs(vec), axis=0)
        scale = jnp.where(amax == 0, jnp.ones_like(amax), amax / self.qmax)
        q = jnp.clip(jnp.round(vec / scale[None, :]),
                     -self.qmax, self.qmax).astype(self.int_dtype)
        return dict(
            q=inplace_row_write(store["q"], i, self._pack(q)),
            scale=jax.lax.dynamic_update_slice_in_dim(
                store["scale"],
                scale.astype(store["scale"].dtype)[None], i, 0))

    def _scaled(self, q, s, dtype):
        """q: (..., n[, k]) ints, s: (..., k) scales -> values (..., n, k)."""
        return self._unpack(q.astype(dtype)) * s[..., None, :].astype(dtype)

    def read_all(self, store, dtype):
        return self._scaled(store["q"][:self.m], store["scale"][:self.m],
                            dtype)

    def read_one(self, store, i, dtype):
        q = jax.lax.dynamic_index_in_dim(store["q"], i, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(store["scale"], i, 0,
                                         keepdims=False)
        return self._unpack(q.astype(dtype)) * s[None].astype(dtype)

    def read_block(self, store, start, size, dtype):
        q = jax.lax.dynamic_slice_in_dim(store["q"], start, size, 0)
        s = jax.lax.dynamic_slice_in_dim(store["scale"], start, size, 0)
        return self._scaled(q, s, dtype)


def make_basis(storage, m, n, k, dtype, block=1):
    if storage in (None, "keep"):
        return KrylovBasis(m, n, k, dtype, block=block)
    if storage == "reduce1":
        return ReducedBasis(m, n, k, dtype, 1, block=block)
    if storage == "reduce2":
        return ReducedBasis(m, n, k, dtype, 2, block=block)
    if storage == "integer":
        return ScaledIntBasis(m, n, k, dtype, jnp.int16, block=block)
    if storage == "int8":
        return ScaledIntBasis(m, n, k, dtype, jnp.int8, block=block)
    # an explicit dtype
    return KrylovBasis(m, n, k, jnp.dtype(storage), block=block)
