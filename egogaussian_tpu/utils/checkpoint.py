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


def save_train_state(path: str, state: Any, host_blob: bytes = None) -> None:
    """Snapshot an arbitrary pytree (e.g. TrainState or a (model, opt, step)
    tuple) atomically. `host_blob` (optional opaque bytes, e.g. a pickled
    host-RNG/iteration payload) is stored INSIDE the same npz so device
    state and host state land in one atomic os.replace — two sidecar files
    would leave a torn pair if the process dies between the renames."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if host_blob is not None:
        arrays["__host__"] = np.frombuffer(host_blob, dtype=np.uint8)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_train_state(path: str, like: Any, return_host: bool = False) -> Any:
    """Restore a pytree saved by save_train_state. `like` provides the
    treedef and leaf dtypes/shapes (shapes must match — capacities are part
    of the checkpoint). With return_host=True also returns the host_blob
    bytes (or None if the checkpoint carries none)."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(like)
    data = np.load(path)
    n_leaf = sum(1 for k in data.files if k.startswith("leaf_"))
    assert n_leaf == len(leaves), (
        f"checkpoint has {n_leaf} leaves, expected {len(leaves)}"
    )
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        want = np.asarray(leaf)
        assert arr.shape == want.shape, (
            f"leaf {i}: checkpoint shape {arr.shape} != expected {want.shape}"
        )
        new_leaves.append(jnp.asarray(arr.astype(want.dtype)))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if return_host:
        blob = data["__host__"].tobytes() if "__host__" in data.files else None
        return state, blob
    return state
