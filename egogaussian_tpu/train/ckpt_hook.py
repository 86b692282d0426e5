"""Mid-stage checkpoint hook for the long training loops.

The pipeline resumes at stage granularity from PLY/pose artifacts
(pipeline.py); this hook adds iteration granularity inside a stage: every
`every` iterations it atomically snapshots (model, opt_state, iteration,
host-RNG state, jax PRNG key) and a fresh run of the same stage resumes
from the latest snapshot (SURVEY.md §5 failure-recovery row, beyond the
reference's manual uncomment-to-resume).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np

from egogaussian_tpu.utils.checkpoint import load_train_state, save_train_state
from egogaussian_tpu.utils.console import CONSOLE


class StageCheckpointer:
    def __init__(self, path: Optional[str], every: int = 0):
        """path=None or every=0 disables checkpointing entirely."""
        self.path = path
        self.every = every
        self.extra: Any = None

    def maybe_save(self, it: int, state: Any, rng: np.random.RandomState,
                   key: jax.Array, extra: Any = None) -> None:
        """`extra`: optional picklable host-side payload (e.g. the coarse
        stage's solved-frame names) restored verbatim by try_restore.

        Device state and host payload are packed into ONE npz (single
        atomic replace) — a crash can never leave a newer state paired
        with an older iteration/RNG snapshot."""
        if not self.path or not self.every or it % self.every:
            return
        blob = pickle.dumps(
            {"it": it, "rng": rng.get_state(), "key": np.asarray(key),
             "extra": extra}
        )
        save_train_state(self.path, state, host_blob=blob)

    def exists(self) -> bool:
        return bool(self.path) and os.path.exists(self.path)

    def peek_capacity(self) -> int:
        """Capacity (leading dim of the first leaf) of the saved state —
        lets the caller grow a fresh model to match before restore."""
        data = np.load(self.path)
        return int(data["leaf_0"].shape[0])

    def try_restore(
        self, state_like: Any, rng: np.random.RandomState, key: jax.Array
    ) -> Tuple[Any, int, jax.Array]:
        """Returns (state, start_iteration, key); start_iteration = 0 when no
        checkpoint exists. Restores the host RNG in place. The extra payload
        (if saved) is available as `self.extra` afterwards."""
        self.extra = None
        if not self.path or not os.path.exists(self.path):
            return state_like, 0, key
        state, blob = load_train_state(self.path, state_like, return_host=True)
        if blob is None:  # checkpoint without a host payload: unusable
            return state_like, 0, key
        host = pickle.loads(blob)
        rng.set_state(host["rng"])
        self.extra = host.get("extra")
        import jax.numpy as jnp

        CONSOLE.log(f"[ckpt] resuming stage from iteration {host['it']}")
        return state, int(host["it"]), jnp.asarray(host["key"])
