"""Checkpoint / resume.

The reference keeps the whole run in memory and cannot resume
(SURVEY.md §5). Here: any pytree of arrays (GraphArrays, Values, solver
state) serializes to one npz and restores to the same pytree structure, so
a batch solve can re-run without re-ingesting, and the fixed-lag smoother
can snapshot its window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["treedef"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like):
    """Restore into the structure of ``like`` (pytree prototype)."""
    z = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    stored = str(treedef).encode()
    if "treedef" in z.files and bytes(z["treedef"].tobytes()) != stored:
        raise ValueError("checkpoint pytree structure mismatch")
    new_leaves = [
        jnp.asarray(z[f"leaf_{i}"]) if hasattr(leaves[i], "dtype") else z[f"leaf_{i}"]
        for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)
