"""Universal no-mutation gate (VERDICT r2 task 1c).

Every factory's ``generate()`` and every solver's ``solve()`` must leave the
input operator (and rhs) bit-identical.  This is the const-correctness the
reference gets for free from ``shared_ptr<const LinOp>`` arguments
(include/ginkgo/core/base/lin_op.hpp:877); here it guards the
``MatrixData.canonical()`` may-alias contract (base/matrix_data.py docstring)
against in-place writers — the exact class of bug that shipped in round 2
(Ilu0.generate overwrote the user's matrix with its LU factors).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ginkgo_tpu import Csr
from ginkgo_tpu.factorization.direct import Cholesky, Lu
from ginkgo_tpu.factorization.par_ilu import Ic0, Ilu0, ParIc, ParIlu
from ginkgo_tpu.factorization.par_ilut import ParIct, ParIlut
from ginkgo_tpu.multigrid.pgm import Pgm
from ginkgo_tpu.preconditioner.ilu import Ic, Ilu
from ginkgo_tpu.preconditioner.isai import Isai
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu.preconditioner.sor import GaussSeidel, Sor
from ginkgo_tpu.reorder import Amd, Mc64, NestedDissection, Rcm
from ginkgo_tpu.solver import Bicgstab, Cg, Gmres, Idr
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd


def _fingerprint(A):
    """Bit-exact snapshot of every array leaf of the operator pytree."""
    import jax
    leaves = jax.tree_util.tree_leaves(A)
    return [np.array(x, copy=True) for x in leaves
            if hasattr(x, "dtype")]


def _assert_unchanged(before, A, label):
    after = _fingerprint(A)
    assert len(before) == len(after), label
    for i, (b, a) in enumerate(zip(before, after)):
        np.testing.assert_array_equal(
            b, a, err_msg=f"{label}: operator leaf {i} was mutated")


def _spd(n=40, seed=0):
    data = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 6), seed=seed), shift=1.0)
    return Csr.from_data(data)


FACTORIES = [
    ("ilu0", Ilu0()),
    ("ic0", Ic0()),
    ("par_ilu", ParIlu(iterations=3)),
    ("par_ic", ParIc(iterations=3)),
    ("par_ilut", ParIlut(iterations=2, fill_in_limit=2.0)),
    ("par_ict", ParIct(iterations=2, fill_in_limit=2.0)),
    ("lu", Lu()),
    ("cholesky", Cholesky()),
    ("jacobi", Jacobi(max_block_size=4)),
    ("ilu_wrapper", Ilu()),
    ("ic_wrapper", Ic()),
    ("isai", Isai(mode="spd")),
    ("sor", Sor(relaxation_factor=1.2)),
    ("gauss_seidel", GaussSeidel()),
    ("pgm", Pgm()),
    ("rcm", Rcm()),
    ("amd", Amd()),
    ("mc64", Mc64()),
    ("nd", NestedDissection(min_size=8)),
]


@pytest.mark.parametrize("factory", [f for _, f in FACTORIES],
                         ids=[n for n, _ in FACTORIES])
def test_generate_does_not_mutate_operator(factory):
    A = _spd()
    before = _fingerprint(A)
    factory.generate(A)
    _assert_unchanged(before, A, type(factory).__name__)


@pytest.mark.parametrize("solver", [Cg, Bicgstab, Gmres, Idr],
                         ids=lambda s: s.name)
def test_solve_does_not_mutate_operator_or_rhs(solver):
    A = _spd(n=30, seed=3)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(30))
    before_a = _fingerprint(A)
    before_b = np.array(b, copy=True)
    solver.solve(A, b, criteria=Iteration(60) | ResidualNorm(1e-10),
                 preconditioner=Ilu().generate(A))
    _assert_unchanged(before_a, A, solver.name)
    np.testing.assert_array_equal(before_b, np.asarray(b))


def test_matrix_data_roundtrip_is_isolated():
    """Mutating a factor produced from A must never reach A's storage."""
    A = _spd(n=25, seed=9)
    dense0 = np.array(A.to_dense(), copy=True)
    f = Ilu0().generate(A)
    # poke the factor's host-visible data hard
    _ = np.asarray(f.l_factor.to_dense())
    np.testing.assert_array_equal(dense0, np.asarray(A.to_dense()))
