"""Mid-run checkpoint / resume of the outer control loop.

The reference has no resumable checkpointing — only cross-run dual
warm-starts via ``ini_lambdas.pkl`` (SURVEY.md §5.4). Here the full carried
fleet state (trajectories, duals, ADMM splitting variables, adaptive-rho
state, step counter) round-trips through one .npz so experiments can be
stopped and resumed exactly.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def save_checkpoint(path: str, state, step: int, meta: dict | None = None):
    """Serialise a FleetState/OCDFleetState pytree + step counter."""
    leaves, treedef = jax.tree.flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__step"] = np.asarray(step)
    payload["__n_leaves"] = np.asarray(len(leaves))
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, template) -> Tuple[object, int]:
    """Restore a pytree of the same structure as ``template``."""
    with np.load(path) as data:
        n = int(data["__n_leaves"])
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
        step = int(data["__step"])
    _, treedef = jax.tree.flatten(template)
    return jax.tree.unflatten(treedef, leaves), step
