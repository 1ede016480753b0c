"""Generic pytree checkpointing.

The reference checkpoints only policy nets (torch.save of net/optimizer/
epoch, trainer.py:625-642); solver state is never persisted because its
solves are minutes-long.  Here every solver state is a NamedTuple pytree
(SURVEY.md section 5), so checkpoint/resume works for *any* of them --
useful for preempting long batched solves on shared TPU pods.

Format: an .npz of ordered numpy leaves plus a JSON meta entry -- no
pickle, so loading a checkpoint can never execute code.  Restoring into
the original NamedTuple type requires passing a matching ``example``
pytree (its treedef is used to unflatten).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(tree)
    arrs = {f"leaf/{i:05d}": np.asarray(jax.device_get(l))
            for i, l in enumerate(leaves)}
    arrs["meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrs)


def load_pytree(path: str, example: Any) -> Any:
    """Restore a pytree saved by save_pytree into the structure of
    ``example`` (e.g. an ``init_state(...)`` result with the same
    shapes)."""
    z = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(example)
    keys = sorted(k for k in z.files if k.startswith("leaf/"))
    if len(keys) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(keys)} leaves, example has "
            f"{len(leaves)}")
    loaded = [z[k] for k in keys]
    # validate shape/dtype per leaf so a mismatched checkpoint fails
    # HERE with a named leaf, not later with an opaque unflatten/shape
    # error deep in a solve (round-2 ADVICE)
    for i, (got, want) in enumerate(zip(loaded, leaves)):
        want_shape = tuple(np.shape(want))
        want_dtype = np.asarray(want).dtype
        if tuple(got.shape) != want_shape or got.dtype != want_dtype:
            raise ValueError(
                f"checkpoint leaf {i} ({keys[i]}) has shape "
                f"{tuple(got.shape)} dtype {got.dtype}, example "
                f"expects shape {want_shape} dtype {want_dtype}")
    return jax.tree_util.tree_unflatten(treedef, loaded)


def load_meta(path: str) -> dict:
    z = np.load(path, allow_pickle=False)
    return json.loads(bytes(z["meta"]).decode())
