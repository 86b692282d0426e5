"""Console logging (reference utils/console.py uses rich; rich is optional
here — plain print fallback keeps the framework dependency-light)."""
from __future__ import annotations

try:
    from rich.console import Console

    CONSOLE = Console()
except ImportError:  # pragma: no cover
    import sys
    import time

    class _PlainConsole:
        def log(self, *args, **kwargs):
            ts = time.strftime("%H:%M:%S")
            print(f"[{ts}]", *args, file=sys.stderr)

        def print(self, *args, **kwargs):
            print(*args)

    CONSOLE = _PlainConsole()


def safe_state(seed: int = 0):
    """Seed every host RNG used by the framework (reference safe_state,
    utils/general_utils.py:158-179 — there it also redirects stdout; here it
    just makes host-side sampling deterministic). Returns a jax PRNG key."""
    import random

    import jax
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
