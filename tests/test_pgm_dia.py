"""Device-resident PGM aggregation (multigrid/pgm_dia.py): slab-based
Luby matching — the common/cuda_hip/multigrid/pgm_kernels.cpp analog
(match_edge / find_strongest_neighbor / assign_to_exist_agg as mask
algebra over (num_offs, n) diagonal slabs)."""

import jax.numpy as jnp
import pytest
import numpy as np

from ginkgo_tpu.matrix.csr import Csr
from ginkgo_tpu.multigrid.pgm import Pgm, pgm_aggregate
from ginkgo_tpu.multigrid.pgm_dia import aggregate_dia, plan_offsets
from ginkgo_tpu.solver import Cg, Multigrid
from ginkgo_tpu.utils.generators import (generate_random_matrix,
                                         stencil_2d, stencil_3d)


def test_plan_offsets_gate():
    d3 = stencil_3d(6, points=27).canonical()
    offs = plan_offsets(d3)
    assert offs is not None and 0 not in offs
    assert np.array_equal(offs, -offs[::-1])          # symmetric set
    rnd = generate_random_matrix(300, 300, nonzeros_per_row=(3, 9),
                                 seed=3).canonical()
    assert plan_offsets(rnd) is None


def test_dia_aggregation_quality_matches_host():
    for data in (stencil_3d(8, points=27), stencil_2d(24, points=9)):
        d = data.canonical()
        n = d.shape[0]
        a_dia = pgm_aggregate(data, algorithm="dia")
        a_host = pgm_aggregate(data, algorithm="general")

        def stats(a):
            sizes = np.bincount(a)
            return (a.max() + 1) / n, sizes.max(), (sizes == 1).sum()

        r_d, mx_d, s_d = stats(a_dia)
        r_h, mx_h, s_h = stats(a_host)
        # same algorithm, different tie hashes: quality must match
        assert abs(r_d - r_h) < 0.08, (r_d, r_h)
        assert mx_d <= 8 and s_d <= max(4 * s_h, n // 50)
        # renumbered densely in first-appearance order
        assert a_dia[0] == 0
        assert np.array_equal(np.unique(a_dia),
                              np.arange(a_dia.max() + 1))


def test_dia_aggregation_deterministic():
    data = stencil_3d(6, points=7)
    a1 = aggregate_dia(data.canonical())
    a2 = aggregate_dia(data.canonical())
    np.testing.assert_array_equal(a1, a2)


@pytest.mark.slow
def test_mgcg_with_dia_aggregation():
    data = stencil_3d(12, points=27)
    A = Csr.from_data(data)
    b = jnp.ones(A.shape[0])
    its = {}
    for alg in ("dia", "general"):
        mg = Multigrid.build(mg_level=Pgm(algorithm=alg)).generate(A)
        r = Cg.solve(A, b, preconditioner=mg.cycle_operator())
        assert bool(np.asarray(r.converged).all())
        its[alg] = int(np.asarray(r.iterations).max())
    assert its["dia"] <= its["general"] + 3, its
