"""Distributed tier tests on the 8-virtual-device CPU mesh
(test/mpi/* analogs: single-device result is the oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr
from ginkgo_tpu.distributed import (DistributedMatrix, IndexMap, Partition,
                                    Schwarz, distribute_vector,
                                    read_distributed)
from ginkgo_tpu.solver import Bicgstab, Cg, Gmres, PipeCg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import (generate_random_matrix, make_spd,
                                         stencil_2d, stencil_3d)


def _mesh(P):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:P]), ("rows",))


# -- Partition / IndexMap ----------------------------------------------------

def test_partition_uniform():
    p = Partition.build_from_global_size_uniform(4, 10)
    np.testing.assert_array_equal(p.ranges, [0, 3, 6, 8, 10])
    assert p.num_parts == 4 and p.global_size == 10 and p.local_size == 3
    np.testing.assert_array_equal(p.owner_of([0, 3, 9]), [0, 1, 3])
    np.testing.assert_array_equal(p.to_local([0, 3, 9]), [0, 0, 1])


def test_partition_padded_roundtrip():
    p = Partition.build_from_global_size_uniform(3, 8)
    x = np.arange(8.0)
    xp = p.to_padded(x)
    assert xp.shape == (9,)
    np.testing.assert_array_equal(p.from_padded(xp), x)


def test_partition_from_mapping():
    p = Partition.build_from_mapping([0, 0, 1, 1, 1, 2], 3)
    np.testing.assert_array_equal(p.ranges, [0, 2, 5, 6])
    with pytest.raises(ValueError):
        Partition.build_from_mapping([0, 1, 0], 2)


def test_index_map():
    p = Partition.build_from_global_size_uniform(4, 16)
    im = IndexMap.build(p, 1, np.array([2, 4, 5, 7, 9, 15]))
    np.testing.assert_array_equal(im.get_remote_global_idxs(), [2, 9, 15])
    np.testing.assert_array_equal(im.get_remote_target_ids(), [0, 2, 3])
    # owned rows 4..7 -> 0..3; ghosts appended after local_size (4)
    np.testing.assert_array_equal(im.map_to_local([4, 7, 2, 15]),
                                  [0, 3, 4, 6])
    with pytest.raises(ValueError):
        im.map_to_local([3])


def test_distributed_vector_subvector():
    from jax.sharding import Mesh

    from ginkgo_tpu.distributed.vector import Vector
    p = Partition.build_from_global_size_uniform(4, 16)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    x = np.arange(48.0).reshape(16, 3)
    v = Vector.from_global(x, p, mesh)
    sub = v.create_subvector(slice(1, 3))
    assert sub.shape[1] == 2
    np.testing.assert_allclose(sub.to_global(), x[:, 1:3])
    np.testing.assert_allclose(np.asarray(sub.compute_norm2()),
                               np.linalg.norm(x[:, 1:3], axis=0))


def test_index_map_to_global_roundtrip():
    p = Partition.build_from_global_size_uniform(4, 16)
    im = IndexMap.build(p, 1, np.array([2, 4, 5, 7, 9, 15]))
    g = np.array([4, 7, 2, 15, 9])
    np.testing.assert_array_equal(im.map_to_global(im.map_to_local(g)), g)
    with pytest.raises(ValueError):
        im.map_to_global([7 + 1])      # local_size 4 + 3 ghosts = 7 slots
    assert p.has_connected_parts() and p.has_ordered_parts()


# -- Distributed matrix -------------------------------------------------------

@pytest.mark.parametrize("P", [2, 4, 8])
def test_dist_spmv_matches_serial(P):
    data = stencil_2d(8, points=9)
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    rng = np.random.default_rng(P)
    x = rng.standard_normal((n, 2))
    xs = distribute_vector(x, part, mesh)
    y = np.asarray(A.apply(xs))
    want = data.to_dense() @ x
    np.testing.assert_allclose(part.from_padded(y), want, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.slow
@pytest.mark.parametrize("comm", ["dense", "neighborhood"])
def test_dist_banded_local_blocks(comm):
    """local >= 256 stencil partitions plan the shared-diagonal banded
    local block (dia_vals set) and the shard_map SpMV runs the banded
    kernel per part — results must match the dense oracle exactly."""
    from ginkgo_tpu.utils.generators import stencil_3d
    data = stencil_3d(16, points=27)         # n=4096
    n = data.shape[0]
    P = 8
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh, comm=comm)
    assert A.dia_vals is not None            # fast path planned
    assert A.dia_vals.shape[0] == P
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 2))
    xs = distribute_vector(x, part, mesh)
    y = np.asarray(A.apply(xs))
    want = data.to_dense() @ x
    np.testing.assert_allclose(part.from_padded(y), want, rtol=1e-12,
                               atol=1e-12)
    # solvers ride the same path unchanged
    spd = make_spd(data, shift=30.0)
    As = read_distributed(spd, part, mesh, comm=comm)
    assert As.dia_vals is not None
    b = distribute_vector(np.ones(n), part, mesh)
    res = Cg.solve(As, b, criteria=Iteration(400) | ResidualNorm(1e-10))
    assert bool(res.converged.all())
    serial = Cg.solve(Csr.from_data(spd), jnp.ones(n),
                      criteria=Iteration(400) | ResidualNorm(1e-10))
    assert abs(int(res.iterations[0]) - int(serial.iterations[0])) <= 1


@pytest.mark.parametrize("comm", ["dense", "neighborhood"])
def test_dist_packed_local_blocks(comm):
    """Unstructured (non-banded) local blocks with column locality plan
    the shared packed-slot layout (pell_vals set, per-part layouts padded
    to uniform Wv/XW) and match the dense oracle."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    rng = np.random.default_rng(3)
    n, n_off = 8192, 24
    offs = rng.integers(-400, 400, (n // 128, n_off))
    pick = rng.random((n, n_off)) < 0.6
    r = np.repeat(np.arange(n), n_off).reshape(n, n_off)
    c = np.clip(r + offs[np.arange(n) // 128], 0, n - 1)
    rows, cols = r[pick], c[pick]
    key = np.unique(rows * n + cols)
    rows, cols = key // n, key % n
    vals = rng.standard_normal(rows.size)
    data = MatrixData((n, n), rows, cols, vals)
    P = 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh, comm=comm)
    assert A.dia_vals is None and A.pell_vals is not None
    assert A.pell_vals.shape[0] == P
    x = rng.standard_normal((n, 2))
    y = np.asarray(A.apply(distribute_vector(x, part, mesh)))
    np.testing.assert_allclose(part.from_padded(y), data.to_dense() @ x,
                               rtol=1e-11, atol=1e-11)


def test_dist_scattered_local_keeps_gather_path():
    """A random local pattern must NOT plan dia_vals (acceptance rule)
    and still match the oracle."""
    data = generate_random_matrix(2048, 2048, nonzeros_per_row=(1, 5),
                                  seed=5)
    part = Partition.build_from_global_size_uniform(4, 2048)
    mesh = _mesh(4)
    A = read_distributed(data, part, mesh)
    assert A.dia_vals is None
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2048, 1))
    y = np.asarray(A.apply(distribute_vector(x, part, mesh)))
    np.testing.assert_allclose(part.from_padded(y), data.to_dense() @ x,
                               rtol=1e-12, atol=1e-12)


def test_dist_matrix_to_dense_matches():
    data = generate_random_matrix(20, 20, nonzeros_per_row=(1, 6), seed=3)
    part = Partition.build_from_global_size_uniform(4, 20)
    A = read_distributed(data, part, _mesh(4))
    got = A.to_dense()
    slot = part.padded_slot(np.arange(20))
    want = np.zeros((part.padded_size, part.padded_size))
    want[np.ix_(slot, slot)] = data.to_dense()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dist_extract_diagonal():
    data = stencil_2d(6, points=5)
    part = Partition.build_from_global_size_uniform(4, 36)
    A = read_distributed(data, part, _mesh(4))
    d = np.asarray(A.extract_diagonal().values)
    np.testing.assert_allclose(part.from_padded(d),
                               np.diag(data.to_dense()), rtol=1e-14)


# -- Distributed solves -------------------------------------------------------

@pytest.mark.parametrize("solver", [Cg, PipeCg, Bicgstab],
                         ids=lambda s: s.name)
def test_dist_solver_matches_serial(solver):
    data = stencil_3d(6, points=7)
    n = data.shape[0]
    P = 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    rng = np.random.default_rng(7)
    x_true = rng.standard_normal(n)
    b = data.to_dense() @ x_true
    bs = distribute_vector(b, part, mesh)
    crit = Iteration(800) | ResidualNorm(1e-11)
    res = solver.solve(A, bs, criteria=crit)
    assert bool(res.converged.all()), solver.name
    np.testing.assert_allclose(part.from_padded(np.asarray(res.x)), x_true,
                               rtol=1e-6, atol=1e-7)
    # oracle: serial solve takes the same iteration count
    serial = solver.solve(Csr.from_data(data), jnp.asarray(b), criteria=crit)
    assert abs(int(res.iterations[0]) - int(serial.iterations[0])) <= 2


@pytest.mark.slow
def test_dist_gmres():
    data = generate_random_matrix(40, 40, nonzeros_per_row=(2, 5), seed=11)
    dense = data.to_dense()
    dense += np.diag(np.abs(dense).sum(1) + 1)
    from ginkgo_tpu.base.matrix_data import MatrixData
    data = MatrixData.from_dense(dense)
    n = 40
    P = 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    x_true = np.random.default_rng(13).standard_normal(n)
    b = dense @ x_true
    bs = distribute_vector(b, part, mesh)
    res = Gmres.solve(A, bs, krylov_dim=30,
                      criteria=Iteration(300) | ResidualNorm(1e-11))
    assert bool(res.converged.all())
    np.testing.assert_allclose(part.from_padded(np.asarray(res.x)), x_true,
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_dist_jacobi_preconditioned_cg():
    data = make_spd(generate_random_matrix(
        48, 48, nonzeros_per_row=(2, 6), seed=17), shift=1.0)
    n = 48
    P = 8
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    b = distribute_vector(np.ones(n), part, mesh)
    M = A.extract_diagonal().inverse()
    res = Cg.solve(A, b, preconditioner=M,
                   criteria=Iteration(500) | ResidualNorm(1e-10))
    assert bool(res.converged.all())


@pytest.mark.slow
def test_schwarz_preconditioner():
    """distributed-solver example analog with additive Schwarz."""
    data = stencil_2d(10, points=5)
    n = 100
    P = 4
    part = Partition.build_from_global_size_uniform(P, n)
    mesh = _mesh(P)
    A = read_distributed(data, part, mesh)
    b = distribute_vector(np.ones(n), part, mesh)
    crit = Iteration(500) | ResidualNorm(1e-10)
    M = Schwarz().generate(A)
    prec = Cg.solve(A, b, criteria=crit, preconditioner=M)
    assert bool(prec.converged.all())
    # solution matches serial
    dense = data.to_dense()
    serial = np.linalg.solve(dense, np.ones(n))
    np.testing.assert_allclose(part.from_padded(np.asarray(prec.x)), serial,
                               rtol=1e-6, atol=1e-7)
    # oracle: serial CG with the same block-diagonal-inverse preconditioner
    # takes the same iteration count
    from ginkgo_tpu import Dense
    blockinv = np.zeros_like(dense)
    for p in range(P):
        lo, hi = part.ranges[p], part.ranges[p + 1]
        blockinv[lo:hi, lo:hi] = np.linalg.inv(dense[lo:hi, lo:hi])
    serial_res = Cg.solve(Csr.from_data(data), jnp.ones(n), criteria=crit,
                          preconditioner=Dense.create(blockinv))
    assert abs(int(prec.iterations[0]) - int(serial_res.iterations[0])) <= 1


def test_dist_solve_jittable():
    data = stencil_2d(6, points=5)
    part = Partition.build_from_global_size_uniform(4, 36)
    mesh = _mesh(4)
    A = read_distributed(data, part, mesh)
    b = distribute_vector(np.ones(36), part, mesh)
    crit = Iteration(300) | ResidualNorm(1e-10)
    x = jax.jit(lambda A, b: Cg.solve(A, b, criteria=crit).x)(A, b)
    serial = np.linalg.solve(data.to_dense(), np.ones(36))
    np.testing.assert_allclose(part.from_padded(np.asarray(x)), serial,
                               rtol=1e-6, atol=1e-7)


def test_neighborhood_schedule_memory_is_o_neighbors():
    """At P=64 parts, a banded partition graph (27-pt stencil -> 2
    neighbor shifts) must keep the neighbor-compressed schedule at
    O(sum_s S_s) per part, NOT the dense (P, P, S) layout
    (neighborhood_communicator.cpp:139-152 parity)."""
    from ginkgo_tpu.distributed.matrix import DistributedMatrix
    from ginkgo_tpu.utils.generators import stencil_3d

    data = stencil_3d(16, points=27)          # n = 4096, P=64 -> local 64
    part = Partition.build_from_global_size_uniform(64, data.shape[0])
    A = DistributedMatrix.from_data(data, part, mesh="schedule-only",
                                    comm="auto")
    assert A.comm == "neighborhood"
    assert len(A.shifts) <= 8                  # banded graph, few shifts
    # the dense (P, P, S) schedule must NOT be in the pytree at all
    assert A.send_idx is None and A.ghost_owner is None
    nb_elems = A.send_nb.shape[1]
    assert nb_elems == sum(A.shift_sizes)
    # a dense-comm build of the same operator carries the (P, P, S) cube;
    # compressed is ~P/len(shifts) smaller
    Ad = DistributedMatrix.from_data(data, part, mesh="schedule-only",
                                     comm="dense")
    assert Ad.send_nb is None
    dense_elems = Ad.send_idx.shape[1] * Ad.send_idx.shape[2]
    assert nb_elems * 8 <= dense_elems


def test_neighborhood_device_bytes_scale_with_neighbors_p256():
    """P=256 schedule-only build: total schedule bytes in the operator
    pytree scale with sum_s S_s (per part), never with P^2
    (neighborhood_communicator.cpp:139-152 parity at pod scale)."""
    import jax as _jax
    from ginkgo_tpu.distributed.matrix import DistributedMatrix
    from ginkgo_tpu.utils.generators import stencil_3d

    data = stencil_3d(32, points=27)          # n = 32768, P=256 -> local 128
    P = 256
    part = Partition.build_from_global_size_uniform(P, data.shape[0])
    A = DistributedMatrix.from_data(data, part, mesh="schedule-only",
                                    comm="neighborhood")
    assert A.send_idx is None                 # dense cube absent entirely
    sched_elems = sum(
        int(np.prod(x.shape)) for x in
        [A.send_nb, A.ghost_roff] if x is not None)
    per_part = sum(A.shift_sizes) + A.ghost_roff.shape[1]
    assert sched_elems == P * per_part        # O(P * sum_s S_s) total
    # vs the dense-comm (P, P, S) cube the same operator would carry
    assert sched_elems * 8 <= P * P * max(A.shift_sizes)


def test_neighborhood_to_dense_reconstructs_schedule():
    """to_dense under 'neighborhood' rebuilds (owner, src row) lazily from
    the compressed schedule and must equal the assembled data."""
    from ginkgo_tpu.distributed.matrix import DistributedMatrix
    from ginkgo_tpu.utils.generators import stencil_2d

    data = stencil_2d(8, points=9)            # n = 64
    part = Partition.build_from_global_size_uniform(8, 64)
    A = DistributedMatrix.from_data(data, part, mesh="schedule-only",
                                    comm="neighborhood")
    np.testing.assert_allclose(A.to_dense()[:64, :64], data.to_dense(),
                               rtol=1e-14)
