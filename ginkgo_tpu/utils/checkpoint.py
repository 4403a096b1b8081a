"""Checkpoint / serialization of operators and solver state.

The reference has no checkpointing (SURVEY.md §5.4 — solves are short);
this is the cheap orbax-style extra it suggests: any linop_dataclass pytree
(formats, factorizations, preconditioners, SolveResult) round-trips through
one ``.npz`` file — array leaves + a structure descriptor — so a long
multigrid hierarchy or ParILUT factorization generated once can be reloaded
without re-running symbolics.
"""

from __future__ import annotations

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, tree) -> None:
    """Save any pytree of arrays (+ picklable static aux) to exactly
    ``path`` (np.savez appends '.npz' to bare names, breaking round-trips,
    so write through a file handle)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load(path: str):
    """Inverse of :func:`save`; arrays come back as jnp arrays."""
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        leaves = [jnp.asarray(z[f"leaf_{i}"])
                  for i in range(len(z.files) - 1)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
