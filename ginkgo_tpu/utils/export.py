"""AOT export of compiled solves (serving path).

Beyond-parity, TPU-native production feature: a configured solve — operator
structure + criteria + preconditioner baked in — exports to a portable
StableHLO artifact via ``jax.export``, deployable without Python-side setup
(the "compiled solver as an artifact" piece of a serving stack).

The operator's *values* stay runtime inputs, so one exported artifact
serves every matrix sharing the pattern (time-stepping, parameter sweeps).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def export_solve(solve_fn, A_template, b_shape_dtype, **solve_kwargs):
    """Export ``x = solve(A, b).x`` with A's pattern/static structure baked
    in and (A's value leaves, b) as runtime inputs.

    Returns the jax.export Exported object (``.serialize()`` for bytes).
    """
    from jax import export as jexport

    leaves, treedef = jax.tree_util.tree_flatten(A_template)

    def fn(leaf_values, b):
        A = jax.tree_util.tree_unflatten(treedef, leaf_values)
        return solve_fn(A, b, **solve_kwargs).x

    leaf_specs = [jax.ShapeDtypeStruct(v.shape, v.dtype) for v in leaves]
    return jexport.export(jax.jit(fn))(leaf_specs, b_shape_dtype)


def serialize_solve(solve_fn, A_template, b_shape_dtype,
                    **solve_kwargs) -> bytes:
    return export_solve(solve_fn, A_template, b_shape_dtype,
                        **solve_kwargs).serialize()


def load_solve(blob: bytes):
    """Deserialize; returns a callable ``run(A_or_leaves, b) -> x``."""
    from jax import export as jexport
    ex = jexport.deserialize(blob)

    def run(A_or_leaves, b):
        leaves = (A_or_leaves if isinstance(A_or_leaves, (list, tuple))
                  else jax.tree_util.tree_leaves(A_or_leaves))
        return ex.call(list(leaves), b)

    return run
