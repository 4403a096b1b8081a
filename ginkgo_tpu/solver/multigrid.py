"""Multigrid solver / preconditioner.

Analog of ``include/ginkgo/core/solver/multigrid.hpp:107`` /
``core/solver/multigrid.cpp``: a level list built from ``MultigridLevel``
factories (PGM by default), V/W/F cycles, pre/mid/post smoothers, coarsest
solver.  The level hierarchy is built at generate time (host); one cycle is
a statically unrolled recursion over the (static) level list, so the whole
cycle jits into a single XLA program.

Usable three ways, as in Ginkgo:
* ``Multigrid.build(...).generate(A)`` -> LinOp whose apply runs ``A⁻¹ b``
  iterating cycles until the criterion fires;
* ``cycle_op = mg.cycle_operator()`` -> one-cycle LinOp (the AMG
  *preconditioner* for CG/GMRES);
* directly as ``preconditioner=`` for any solver (factories are accepted).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..matrix.dense import compute_norm2
from ..stop.criterion import CheckArgs, default_criterion
from .common import (finish, prepare_rhs, run_iteration_loop)


@linop_dataclass
class _DampedJacobiSmoother(LinOp):
    """Default smoother: ``iters`` sweeps of omega-damped scalar Jacobi
    (Ginkgo's build_smoother(Jacobi, iterations=2, relaxation=0.9) default,
    multigrid.cpp)."""

    inv_diag: jnp.ndarray
    A: LinOp
    omega: float = static_field(default=0.9)
    iters: int = static_field(default=2)

    @property
    def shape(self):
        return self.A.shape

    def smooth(self, b, x):
        d = self.inv_diag[:, None].astype(b.dtype)
        for _ in range(self.iters):
            x = x + self.omega * d * (b - self.A._apply(x))
        return x

    def _apply(self, b):
        return self.smooth(b, jnp.zeros_like(b))


def _default_smoother(A):
    diag = A.extract_diagonal().values
    inv = jnp.where(diag == 0, jnp.ones_like(diag), 1.0 / diag)
    return _DampedJacobiSmoother(inv_diag=inv, A=A)


def _smooth(sm, A, b, x):
    """Run a smoother: native .smooth if present, else one correction step
    x + S(b - A x) so any solver/preconditioner LinOp works as a smoother."""
    if hasattr(sm, "smooth"):
        return sm.smooth(b, x)
    return x + sm._apply(b - A._apply(x))


@linop_dataclass
class _CastOp(LinOp):
    """Applies inner then casts — the mixed-multigrid precision boundary."""

    inner: LinOp
    out_dtype: object = static_field(default=None)

    @property
    def shape(self):
        return self.inner.shape

    def _apply(self, b):
        return self.inner._apply(b).astype(self.out_dtype)


@linop_dataclass
class _DenseCoarseSolver(LinOp):
    inv: jnp.ndarray

    @property
    def shape(self):
        return self.inv.shape

    def _apply(self, b):
        return jnp.dot(self.inv.astype(b.dtype), b,
                       preferred_element_type=b.dtype)


@linop_dataclass
class MultigridOp(LinOp):
    """Generated multigrid hierarchy; apply = solve to criterion."""

    levels: tuple          # of MultigridLevel
    smoothers: tuple       # of smoother LinOps (per level)
    coarsest: LinOp
    criteria: object = static_field(default=None)
    cycle: str = static_field(default="v")

    @property
    def shape(self):
        return self.levels[0].fine_op.shape if self.levels else \
            self.coarsest.shape

    # -- one multigrid cycle (recursive, statically unrolled) ---------------
    def run_cycle(self, b, x, level: int = 0):
        if level >= len(self.levels):
            return self.coarsest._apply(b)
        lvl = self.levels[level]
        sm = self.smoothers[level]
        x = _smooth(sm, lvl.fine_op, b, x)        # pre-smooth
        r = b - lvl.fine_op._apply(x)
        rc = lvl.restrict._apply(r)
        xc = jnp.zeros_like(rc)
        if self.cycle == "k" and level + 1 < len(self.levels):
            # K-cycle (Notay): Krylov-accelerated coarse solve — one cycle
            # application plus a minimization step on the coarse system
            xc = self._kcycle_solve(rc, level + 1)
        else:
            xc = self.run_cycle(rc, xc, level + 1)
            if self.cycle == "w" and level + 1 < len(self.levels):
                xc = self.run_cycle(rc, xc, level + 1)
            elif self.cycle == "f" and level + 1 < len(self.levels):
                # F-cycle: after the recursive F, one extra V from here
                xc = self._v_cycle(rc, xc, level + 1)
        x = x + lvl.prolong._apply(xc)            # coarse-grid correction
        x = _smooth(sm, lvl.fine_op, b, x)        # post-smooth
        return x

    def _kcycle_solve(self, b, level):
        """~2 steps of cycle-preconditioned minimization on the level's
        system (the kcycle of multigrid_kernels; simplified steepest
        descent in the cycle-preconditioned direction)."""
        A = self.levels[level].fine_op
        x = self.run_cycle(b, jnp.zeros_like(b), level)
        r = b - A._apply(x)
        z = self.run_cycle(r, jnp.zeros_like(r), level)
        Az = A._apply(z)
        num = jnp.sum(jnp.conj(z) * r, axis=0)
        den = jnp.sum(jnp.conj(z) * Az, axis=0)
        alpha = jnp.where(den == 0, jnp.zeros_like(num), num /
                          jnp.where(den == 0, jnp.ones_like(den), den))
        return x + alpha[None, :] * z

    def _v_cycle(self, b, x, level):
        if level >= len(self.levels):
            return self.coarsest._apply(b)
        lvl = self.levels[level]
        sm = self.smoothers[level]
        x = _smooth(sm, lvl.fine_op, b, x)
        r = b - lvl.fine_op._apply(x)
        xc = self._v_cycle(lvl.restrict._apply(r),
                           jnp.zeros((lvl.restrict.shape[0], b.shape[1]),
                                     b.dtype), level + 1)
        x = x + lvl.prolong._apply(xc)
        return _smooth(sm, lvl.fine_op, b, x)

    def cycle_operator(self) -> "MultigridCycleOp":
        """One-cycle LinOp — the AMG preconditioner."""
        return MultigridCycleOp(mg=self)

    # -- solve to criterion --------------------------------------------------
    def solve(self, b, x0=None, *, criteria=None, trace=False):
        A = self.levels[0].fine_op
        b2, x, squeeze = prepare_rhs(A, b, x0)
        crit = criteria if criteria is not None else (
            self.criteria if self.criteria is not None
            else default_criterion(b2.dtype))
        r = b2 - A._apply(x)
        state = dict(x=x, r=r)
        b_norm = compute_norm2(b2)
        r0_norm = compute_norm2(r)

        def step(s):
            x = self.run_cycle(b2, s["x"])
            return dict(x=x, r=b2 - A._apply(x))

        def make_check_args(s, it):
            return CheckArgs(iteration=it, residual=s["r"])

        final, history = run_iteration_loop(
            step, make_check_args, state, crit, b2, r0_norm, b_norm,
            trace=trace)
        return finish(final, history, final["state"]["x"],
                      final["state"]["r"], squeeze)

    def _apply(self, b):
        return self.solve(b).x


@linop_dataclass
class MultigridCycleOp(LinOp):
    mg: MultigridOp

    @property
    def shape(self):
        return self.mg.shape

    def _apply(self, b):
        return self.mg.run_cycle(b, jnp.zeros_like(b))


class Multigrid:
    """Factory (``multigrid.hpp`` params): ``mg_level`` (coarsening factory,
    default Pgm), ``max_levels``, ``min_coarse_rows``, ``cycle`` in
    v/w/f/k (k = Krylov-accelerated coarse-grid correction, kcycle),
    ``smoother`` (factory or None for damped Jacobi), ``coarsest_solver``
    (factory or None for dense inverse), ``criteria``."""

    def __init__(self, mg_level=None, max_levels: int = 10,
                 min_coarse_rows: int = 16, cycle: str = "v",
                 smoother=None, coarsest_solver=None, criteria=None,
                 coarse_dtype=None):
        if cycle not in ("v", "w", "f", "k"):
            raise ValueError(
                f"unknown multigrid cycle {cycle!r}; expected one of "
                "'v', 'w', 'f', 'k'")
        self.mg_level = mg_level
        self.max_levels = max_levels
        self.min_coarse_rows = min_coarse_rows
        self.cycle = cycle
        self.smoother = smoother
        self.coarsest_solver = coarsest_solver
        self.criteria = criteria
        # mixed-multigrid (mixed-multigrid-solver example): coarse levels
        # stored/smoothed at reduced precision, casts at the transfer ops
        self.coarse_dtype = coarse_dtype

    @classmethod
    def build(cls, **kw):
        return cls(**kw)

    def generate(self, A) -> MultigridOp:
        from ..multigrid.pgm import Pgm
        coarsener = self.mg_level if self.mg_level is not None else Pgm()
        levels = []
        smoothers = []
        op = A
        for li in range(self.max_levels):
            if op.shape[0] <= self.min_coarse_rows:
                break
            lvl = coarsener.generate(op)
            if lvl.coarse_op.shape[0] >= op.shape[0]:
                break   # coarsening stalled
            if self.coarse_dtype is not None:
                import dataclasses
                fine_dtype = op.dtype
                lvl = dataclasses.replace(
                    lvl,
                    coarse_op=lvl.coarse_op.astype(self.coarse_dtype),
                    restrict=_CastOp(inner=lvl.restrict,
                                     out_dtype=self.coarse_dtype),
                    prolong=_CastOp(inner=lvl.prolong,
                                    out_dtype=fine_dtype))
            levels.append(lvl)
            if self.smoother is None:
                smoothers.append(_default_smoother(op))
            else:
                smoothers.append(self.smoother.generate(op))
            op = lvl.coarse_op
        if self.coarsest_solver is None:
            dense = np.asarray(op.to_dense())
            coarsest = _DenseCoarseSolver(inv=jnp.asarray(
                np.linalg.inv(dense)))
        else:
            coarsest = self.coarsest_solver.generate(op)
        return MultigridOp(levels=tuple(levels), smoothers=tuple(smoothers),
                           coarsest=coarsest, criteria=self.criteria,
                           cycle=self.cycle)
