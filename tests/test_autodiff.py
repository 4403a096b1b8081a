"""Implicit differentiation of solves (beyond-parity JAX-native feature)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ginkgo_tpu as gt
from ginkgo_tpu.autodiff import make_differentiable_solve
from ginkgo_tpu.solver import cg
from ginkgo_tpu.stop.criterion import Iteration, ResidualNorm
from ginkgo_tpu.utils.generators import generate_random_matrix, make_spd

CRIT = Iteration(2000) | ResidualNorm(1e-13)


def _spd(n=12, seed=0):
    data = make_spd(generate_random_matrix(
        n, n, nonzeros_per_row=(2, 4), seed=seed), shift=1.0)
    return gt.Csr.from_data(data), data


def test_grad_wrt_rhs():
    A, data = _spd()
    solve = make_differentiable_solve(cg.solve, criteria=CRIT)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(12))

    def loss(b):
        return jnp.sum(solve(A, b) ** 2)

    g = jax.grad(loss)(b)
    # finite-difference check
    eps = 1e-6
    g_fd = np.zeros(12)
    for i in range(12):
        bp = b.at[i].add(eps)
        bm = b.at[i].add(-eps)
        g_fd[i] = (float(loss(bp)) - float(loss(bm))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-4, atol=1e-6)


def test_grad_wrt_matrix_values():
    A, data = _spd(10, seed=2)
    solve = make_differentiable_solve(cg.solve, criteria=CRIT)
    b = jnp.asarray(np.random.default_rng(3).standard_normal(10))

    def loss(vals):
        import dataclasses
        A2 = dataclasses.replace(A, values=vals)
        return jnp.sum(solve(A2, b) ** 2)

    g = jax.grad(loss)(A.values)
    eps = 1e-6
    for e in [0, 3, 7, int(A.nnz) - 1]:
        vp = A.values.at[e].add(eps)
        vm = A.values.at[e].add(-eps)
        fd = (float(loss(vp)) - float(loss(vm))) / (2 * eps)
        np.testing.assert_allclose(float(g[e]), fd, rtol=1e-3, atol=1e-6)
    # padded entries receive zero gradient
    assert float(jnp.abs(g[A.nnz:]).max() if g.shape[0] > A.nnz else 0) == 0


def test_grad_dense_operator():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((6, 6))
    a = a @ a.T + 6 * np.eye(6)
    A = gt.Dense.create(a)
    b = jnp.asarray(rng.standard_normal(6))
    solve = make_differentiable_solve(cg.solve, criteria=CRIT)

    def loss(data):
        return jnp.sum(solve(gt.Dense.create(data), b) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(a)))
    # analytic: x = A^-1 b, dL/dA = -2 (A^-1 x) x^T  (A symmetric)
    x = np.linalg.solve(a, np.asarray(b))
    lam = np.linalg.solve(a, 2 * x)
    want = -np.outer(lam, x)
    np.testing.assert_allclose(g, want, rtol=1e-6, atol=1e-8)


def test_grad_through_jit():
    A, data = _spd(8, seed=5)
    solve = make_differentiable_solve(cg.solve, criteria=CRIT)
    b = jnp.ones(8)
    g = jax.jit(jax.grad(lambda b: solve(A, b).sum()))(b)
    # dL/db = A^-T 1
    want = np.linalg.solve(data.to_dense().T, np.ones(8))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-7, atol=1e-9)


def test_grad_complex_operator_matches_linalg_solve():
    """Complex cotangent convention matches jnp.linalg.solve gradients."""
    rng = np.random.default_rng(7)
    n = 6
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = a @ a.conj().T + n * np.eye(n)          # HPD
    b = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    solve = make_differentiable_solve(cg.solve, criteria=CRIT)

    def loss_ours(data):
        return jnp.sum(jnp.abs(solve(gt.Dense.create(data), b)) ** 2)

    def loss_ref(data):
        return jnp.sum(jnp.abs(jnp.linalg.solve(data, b)) ** 2)

    aj = jnp.asarray(a)
    g_ours = np.asarray(jax.grad(loss_ours)(aj))
    g_ref = np.asarray(jax.grad(loss_ref)(aj))
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-6, atol=1e-9)
    gb_ours = np.asarray(jax.grad(lambda b: jnp.sum(jnp.abs(
        solve(gt.Dense.create(aj), b)) ** 2))(b))
    gb_ref = np.asarray(jax.grad(lambda b: jnp.sum(jnp.abs(
        jnp.linalg.solve(aj, b)) ** 2))(b))
    np.testing.assert_allclose(gb_ours, gb_ref, rtol=1e-6, atol=1e-9)
