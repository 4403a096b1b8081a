"""Base-layer components: segmented_array, index_set, device primitives,
precision dispatch, version info, composite operators, distributed vector /
assembly / neighborhood communicator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr, Dense, Identity
from ginkgo_tpu.base.collections import IndexSet, SegmentedArray
from ginkgo_tpu.base.composition import (BlockOperator, Combination,
                                         Composition, Perturbation)
from ginkgo_tpu.base.precision import (precision_dispatch,
                                       precision_dispatch_real_complex,
                                       version_info)
from ginkgo_tpu.ops.components import (Bitvector, DisjointSets,
                                       convert_idxs_to_ptrs,
                                       convert_ptrs_to_idxs,
                                       prefix_sum_nonnegative,
                                       segment_reduce)
from ginkgo_tpu.utils.generators import stencil_2d


def test_segmented_array():
    s = SegmentedArray.from_segments([[1.0, 2.0], [3.0], [], [4.0, 5.0, 6.0]])
    assert s.num_segments == 4
    np.testing.assert_allclose(s.segment(0), [1, 2])
    np.testing.assert_allclose(s.segment(2), [])
    np.testing.assert_allclose(s.segment_sums(), [3, 3, 0, 15])


def test_index_set():
    s = IndexSet(20, [3, 4, 5, 9, 10, 17])
    assert s.num_subsets == 3
    assert s.get_num_elems() == 6
    np.testing.assert_array_equal(s.contains([3, 6, 10, 17, 19]),
                                  [True, False, True, True, False])
    np.testing.assert_array_equal(s.get_local_index([3, 5, 9, 17, 0]),
                                  [0, 2, 3, 5, -1])
    np.testing.assert_array_equal(s.get_global_index([0, 2, 3, 5, 6]),
                                  [3, 5, 9, 17, -1])
    np.testing.assert_array_equal(s.to_global_indices(),
                                  [3, 4, 5, 9, 10, 17])
    with pytest.raises(ValueError):
        IndexSet(5, [7])


def test_prefix_sum_and_conversions():
    x = jnp.asarray([3, 0, 2, 5])
    out, total = prefix_sum_nonnegative(x)
    np.testing.assert_array_equal(out, [0, 3, 3, 5])
    assert int(total) == 10
    ptrs = convert_idxs_to_ptrs(jnp.asarray([0, 0, 2, 2, 2, 3]), 4)
    np.testing.assert_array_equal(ptrs, [0, 2, 2, 5, 6])
    idxs = convert_ptrs_to_idxs(ptrs, 6)
    np.testing.assert_array_equal(idxs, [0, 0, 2, 2, 2, 3])


def test_bitvector():
    bits = np.zeros(100, bool)
    on = [0, 5, 31, 32, 64, 99]
    bits[on] = True
    bv = Bitvector(bits)
    for i in [0, 1, 5, 31, 32, 33, 99]:
        assert bool(bv.get(i)) == bits[i], i
    # rank = #set bits strictly before
    for i in [0, 6, 32, 64, 100 - 1]:
        assert int(bv.rank(i)) == int(bits[:i].sum()), i


def test_disjoint_sets():
    ds = DisjointSets(6)
    ds.union(0, 1)
    ds.union(2, 3)
    ds.union(1, 3)
    assert ds.find(0) == ds.find(2)
    assert ds.find(4) != ds.find(0)
    assert ds.num_sets() == 3


def test_segment_reduce_ops():
    v = jnp.asarray([1.0, 5.0, 2.0, 7.0])
    ids = jnp.asarray([0, 0, 1, 1])
    np.testing.assert_allclose(segment_reduce(v, ids, 2, "max"), [5, 7])
    np.testing.assert_allclose(segment_reduce(v, ids, 2, "min"), [1, 2])


def test_precision_dispatch():
    from ginkgo_tpu.solver import cg
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    data = stencil_2d(6, points=5)
    A32 = Csr.from_data(data, dtype=np.float32)
    b64 = jnp.ones(36, jnp.float64)
    crit = Iteration(300) | ResidualNorm(1e-6)
    res = precision_dispatch(
        lambda A, b, **kw: cg.solve(A, b, **kw), A32, b64, criteria=crit)
    assert res.x.dtype == jnp.float64          # converted back
    assert bool(res.converged.all())


def test_precision_dispatch_complex_over_real():
    from ginkgo_tpu.solver import cg
    from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
    data = stencil_2d(5, points=5)
    A = Csr.from_data(data)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(25) + 1j * rng.standard_normal(25))
    crit = Iteration(300) | ResidualNorm(1e-11)
    res = precision_dispatch_real_complex(
        lambda A, bb, **kw: cg.solve(A, bb, **kw), A, b, criteria=crit)
    want = np.linalg.solve(data.to_dense(), np.asarray(b))
    np.testing.assert_allclose(res.x, want, rtol=1e-7, atol=1e-8)


def test_version_info():
    v = version_info.get()
    assert "ginkgo_tpu" in v and "jax" in v


def test_composites():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((6, 6))
    c = rng.standard_normal((6, 6))
    A, C = Dense.create(a), Dense.create(c)
    b = jnp.asarray(rng.standard_normal(6))
    np.testing.assert_allclose(Composition(ops=(A, C)).apply(b), a @ (c @ b),
                               rtol=1e-12)
    np.testing.assert_allclose(
        Combination(coefficients=(2.0, -1.0), operators=(A, C)).apply(b),
        2 * a @ b - c @ b, rtol=1e-12)
    np.testing.assert_allclose(
        Perturbation(scalar=0.5, basis=A, projector=C).apply(b),
        b + 0.5 * (a @ (c @ b)), rtol=1e-12)
    blk = BlockOperator(blocks=((A, None), (C, Identity(size=6))))
    b2 = jnp.asarray(rng.standard_normal(12))
    want = np.block([[a, np.zeros((6, 6))], [c, np.eye(6)]]) @ np.asarray(b2)
    np.testing.assert_allclose(blk.apply(b2), want, rtol=1e-12)


# -- distributed additions -------------------------------------------------------

def _mesh(P):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:P]), ("rows",))


def test_distributed_vector():
    from ginkgo_tpu.distributed import Partition, Vector
    part = Partition.build_from_global_size_uniform(4, 10)
    mesh = _mesh(4)
    rng = np.random.default_rng(2)
    a = rng.standard_normal(10)
    b = rng.standard_normal(10)
    va = Vector.from_global(a, part, mesh)
    vb = Vector.from_global(b, part, mesh)
    np.testing.assert_allclose(float(va.compute_dot(vb)[0]), a @ b,
                               rtol=1e-12)
    np.testing.assert_allclose(float(va.compute_norm2()[0]),
                               np.linalg.norm(a), rtol=1e-12)
    np.testing.assert_allclose(va.add_scaled(2.0, vb).to_global(),
                               a + 2 * b, rtol=1e-12)
    np.testing.assert_allclose(va.local_view(1), a[3:6])


def test_assembly_communicate():
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.distributed import Partition, assemble_distributed
    part = Partition.build_from_global_size_uniform(2, 4)
    mesh = _mesh(2)
    # both ranks contribute to entry (1, 1) — communicate mode sums them
    c0 = MatrixData((4, 4), [0, 1, 1], [0, 1, 2], [1.0, 2.0, 1.0])
    c1 = MatrixData((4, 4), [1, 2, 3], [1, 2, 3], [3.0, 4.0, 5.0])
    A = assemble_distributed([c0, c1], part, mesh, mode="communicate")
    dense = A.to_dense()
    assert dense[1, 1] == 5.0     # 2 + 3
    # local_only drops rank 1's row-1 contribution (owned by rank 0)
    A2 = assemble_distributed([c0, c1], part, mesh, mode="local_only")
    assert A2.to_dense()[1, 1] == 2.0


@pytest.mark.slow
def test_neighborhood_communicator_matches_dense():
    from ginkgo_tpu.distributed import Partition, distribute_vector, \
        read_distributed
    data = stencil_2d(8, points=9)
    part = Partition.build_from_global_size_uniform(4, 64)
    mesh = _mesh(4)
    Ad = read_distributed(data, part, mesh, comm="dense")
    An = read_distributed(data, part, mesh, comm="neighborhood")
    assert An.shifts == (1, 3)    # banded partition: only +-1 ring neighbors
    x = distribute_vector(np.random.default_rng(3).standard_normal(64),
                          part, mesh)
    np.testing.assert_allclose(np.asarray(An.apply(x)),
                               np.asarray(Ad.apply(x)), rtol=1e-12)


def test_range_minimum_query():
    from ginkgo_tpu.ops.components import RangeMinimumQuery
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1000, 200)
    rmq = RangeMinimumQuery(v)
    for lo, hi in [(0, 200), (5, 6), (13, 57), (100, 199), (0, 1)]:
        assert rmq.min(lo, hi) == v[lo:hi].min(), (lo, hi)
        assert v[rmq.argmin(lo, hi)] == v[lo:hi].min()
    with pytest.raises(ValueError):
        rmq.argmin(5, 5)


def test_addressable_priority_queue():
    from ginkgo_tpu.ops.components import AddressablePriorityQueue
    q = AddressablePriorityQueue()
    q.insert("a", 5)
    q.insert("b", 3)
    q.insert("c", 9)
    q.update_key("c", 1)        # decrease-key
    assert len(q) == 3 and "c" in q
    assert q.pop_min() == ("c", 1)
    assert q.pop_min() == ("b", 3)
    q.update_key("a", 10)       # increase-key
    assert q.pop_min() == ("a", 10)
    with pytest.raises(IndexError):
        q.pop_min()
