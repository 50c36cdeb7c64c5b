"""Training-state checkpointing.

The reference persists only final embeddings (.npy) and has no resume
(SURVEY.md §5: a crashed run restarts from scratch, optimizer state is
never saved).  Here full training state — params, optimizer state, PRNG
key, epoch counter, and model extras like bootstrapping pseudo-labels —
round-trips through one .npz (arrays) + .json (tree structure) pair, so
any BasicModel run can resume mid-training.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_state(path: str, state: Dict[str, Any]) -> None:
    """state: pytree of arrays / scalars / None."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w", encoding="utf8") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves),
                   "keys": _tree_spec(state)}, f)


def load_state(path: str, like: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Restore into the structure of `like` (same treedef as saved)."""
    if not (os.path.exists(path + ".npz") and os.path.exists(path + ".json")):
        return None
    data = np.load(path + ".npz")
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    _, treedef = jax.tree_util.tree_flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint at {path} has {len(leaves)} leaves; current state "
            f"structure expects {treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _tree_spec(state) -> Any:
    if isinstance(state, dict):
        return {k: _tree_spec(v) for k, v in sorted(state.items())}
    return "leaf"
