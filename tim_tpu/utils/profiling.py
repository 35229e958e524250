"""Profiling + experiment tracking hooks.

The reference has no profiler integration (SURVEY.md §5.1 — wall-clock
timers only) and hard-wires wandb offline mode
(``recognition/scripts/train.py:95-101``). Here both are first-class but
optional: an XLA trace context manager (view in TensorBoard/Perfetto) and a
no-op-safe wandb wrapper.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture a device trace for the enclosed steps:

        with xla_trace("runs/trace"):
            for _ in range(3): state, _ = train_step(state, batch, rng)
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ExperimentLogger:
    """wandb if available and enabled, the python logger otherwise —
    stats are never silently dropped."""

    def __init__(self, enable_wandb: bool = False, project: str = "tim-tpu",
                 config: Optional[Dict] = None, mode: str = "offline"):
        import logging
        self._log = logging.getLogger("tim_tpu")
        self._wandb = None
        if enable_wandb:
            try:
                import wandb
                wandb.init(project=project, config=config or {}, mode=mode)
                self._wandb = wandb
            except Exception as exc:
                self._log.warning(
                    "wandb requested but unavailable (%s) — experiment "
                    "stats will go to the python logger instead", exc)

    def log(self, stats: Dict, step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(stats, step=step)
        else:
            self._log.info("experiment%s: %s",
                           f" step {step}" if step is not None else "",
                           stats)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
