"""Checkpoint / resume.

The reference's resume mechanism is warm starting plus a long-lived
workspace (SURVEY.md §5); here the solver state is a pytree, so
checkpointing is a direct save/load.  Two levels:

- ``save_result``/``load_result``: persist a Result; feeding its x/y into
  ``warm_start`` is the first-class algorithmic resume.
- ``save_pytree``/``load_pytree``: persist any solver pytree (SolverState,
  ScaledProblem, batched or not) as an .npz — enough to stop a long
  batched solve at a chunk boundary and continue later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), **arrays)


def load_pytree(path: str, like):
    """Load leaves saved by ``save_pytree`` into the structure of ``like``.

    The stored treedef must match ``like``'s: a structure with the same
    leaf count but different field order would otherwise silently
    misassign leaves by index."""
    data = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree.flatten(like)
    stored = bytes(data["__treedef__"]).decode()
    if stored != repr(treedef):
        raise ValueError(
            "checkpoint treedef mismatch:\n"
            f"  stored: {stored}\n  expected: {treedef!r}")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)


def save_result(path: str, result) -> None:
    save_pytree(path, result)


def load_result(path: str, like):
    return load_pytree(path, like)
