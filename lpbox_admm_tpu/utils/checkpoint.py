"""Generic pytree checkpointing.

The reference checkpoints only policy nets (torch.save of net/optimizer/
epoch, trainer.py:625-642); solver state is never persisted because its
solves are minutes-long.  Here every solver state is a NamedTuple pytree
(SURVEY.md section 5), so checkpoint/resume works for *any* of them --
useful for preempting long batched solves on shared TPU pods.

Format: a pickle of {treedef_repr, leaves (numpy), meta}.  Restoring
into the original NamedTuple type requires passing a matching
``example`` pytree (its treedef is used to unflatten).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {
        "leaves": [np.asarray(jax.device_get(l)) for l in leaves],
        "treedef": str(treedef),
        "meta": meta or {},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_pytree(path: str, example: Any) -> Any:
    """Restore a pytree saved by save_pytree into the structure of
    ``example`` (e.g. an ``init_state(...)`` result with the same
    shapes)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    leaves, treedef = jax.tree_util.tree_flatten(example)
    saved = payload["leaves"]
    if len(saved) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(saved)} leaves, example has "
            f"{len(leaves)}")
    return jax.tree_util.tree_unflatten(treedef, saved)


def load_meta(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)["meta"]
