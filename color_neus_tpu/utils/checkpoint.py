"""Pytree checkpointing: single-file npz of any jax pytree.

Replaces the reference's three-file torch checkpoint
({Model}.pth.tar + train_param.pth.tar + random_state.pkl,
lib/utils/io_utils.py:44-163) with one atomic npz holding the full train
state — params, optimizer state, step AND the PRNG key, which subsumes
the reference's RandomState pickle (recorder.py:81-87): restoring the
key restores the exact sampling stream.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree) -> None:
    """Atomic save: leaves keyed by index + a treedef repr for sanity."""
    leaves, treedef = _flatten_with_paths(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.asarray(str(treedef))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_pytree_like(template, path: str):
    """Restore into the structure of `template` (shapes are validated)."""
    with np.load(path, allow_pickle=False) as data:
        t_leaves, treedef = _flatten_with_paths(template)
        n = len([k for k in data.files if k.startswith("leaf_")])
        if n != len(t_leaves):
            raise ValueError(
                f"checkpoint has {n} leaves but template has {len(t_leaves)} "
                f"({path}); treedef in file: {data['__treedef__']}")
        leaves = []
        for i, tl in enumerate(t_leaves):
            arr = data[f"leaf_{i}"]
            tshape = tuple(np.shape(tl))
            if tuple(arr.shape) != tshape:
                raise ValueError(f"leaf {i}: shape {arr.shape} != template {tshape}")
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_exists(path: str) -> bool:
    return os.path.isfile(path)
