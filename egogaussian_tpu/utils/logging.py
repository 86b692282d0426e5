"""Training observability: metrics logging and profiler traces.

SURVEY.md §5: the reference logs to wandb (hardcoded scratch dir) + rich
console + tqdm. Here:
  * MetricsLogger writes JSONL locally (always works offline) and mirrors to
    wandb when the package is importable and enabled — wandb is optional.
  * trace() wraps a code region in a jax.profiler trace for TPU timeline
    inspection (the reference has no profiling at all).
  * StepTimer measures steady-state steps/sec excluding compiles.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        use_wandb: bool = False,
        project: str = "egogaussian_tpu",
        run_name: Optional[str] = None,
    ):
        self._file = None
        self._wandb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=run_name)
            except Exception:
                self._wandb = None  # offline / not installed: JSONL only

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(rec, step=int(step))

    def flush(self) -> None:
        if self._file:
            self._file.flush()

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None


# ---------------------------------------------------------------------------
# Active-logger handle: run_pipeline (or any driver) installs a MetricsLogger
# once; stage trainers emit through log_metrics() at their existing
# host-sync boundaries (densify/checkpoint intervals) so the training loop's
# one-async-dispatch invariant is untouched. The reference logs to wandb
# every iteration from every trainer (trainers/train_static.py:54,112,
# coarse_obj_pose.py:143,264-309); per-iteration host syncs over the remote
# TPU tunnel cost more than the step itself, so the cadence here is the
# interval cadence — same curves, decimated.
# ---------------------------------------------------------------------------
_ACTIVE: Optional[MetricsLogger] = None


def set_active_logger(logger: Optional[MetricsLogger]) -> None:
    global _ACTIVE
    if _ACTIVE is not None and logger is not _ACTIVE:
        _ACTIVE.flush()
    _ACTIVE = logger


def get_active_logger() -> Optional[MetricsLogger]:
    return _ACTIVE


def log_metrics(stage: str, step: int, **metrics: Any) -> None:
    """Emit stage metrics through the active logger (no-op when none is
    installed). Values may be device scalars — conversion happens here, so
    call this ONLY at host-sync boundaries."""
    if _ACTIVE is not None:
        _ACTIVE.log(step, stage=stage, **metrics)


@contextlib.contextmanager
def active_logger(logger: MetricsLogger):
    """Install `logger` for the enclosed region and close it after."""
    set_active_logger(logger)
    try:
        yield logger
    finally:
        set_active_logger(None)
        logger.close()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed region (view with TensorBoard or
    xprof). Usage: `with trace('/tmp/jax-trace'): ... run steps ...`"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer (reference's tqdm/EMA-loss progress twin, plus
    steps/sec)."""

    def __init__(self, ema: float = 0.9):
        self._last = None
        self._ema_dt = None
        self._ema = ema

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._ema_dt = (
                dt if self._ema_dt is None
                else self._ema * self._ema_dt + (1 - self._ema) * dt
            )
        self._last = now
        return self._ema_dt

    @property
    def steps_per_sec(self) -> Optional[float]:
        return None if not self._ema_dt else 1.0 / self._ema_dt
