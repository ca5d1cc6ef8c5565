"""Logging / observability utilities.

Replaces the reference's file+stream logger and stdout tee
(/root/reference/era5_data/utils.py:21-60) and adds what it lacks
(SURVEY.md §5.1): per-step timing hooks and a jax.profiler trace context
for TPU profiling.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time
from typing import Iterator, Optional


def setup_logger(name: str, log_path: Optional[str] = None,
                 level: int = logging.INFO) -> logging.Logger:
    """File + stream logger; idempotent per name (era5_data/utils.py:21-40)."""
    log = logging.getLogger(name)
    if log.handlers:
        return log
    log.setLevel(level)
    log.propagate = False
    fmt = logging.Formatter("%(asctime)s.%(msecs)03d : %(message)s",
                            datefmt="%y-%m-%d %H:%M:%S")
    if log_path:
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        fh = logging.FileHandler(log_path, mode="a")
        fh.setFormatter(fmt)
        log.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    log.addHandler(sh)
    return log


class StepTimer:
    """Rolling per-step wall-clock stats for the hot loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / max(len(self.times), 1)


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def get_writer(path: str):
    """TensorBoard writer (tensorboardX like the reference,
    finetune/finetune_fully.py:58), or a silent stub if unavailable."""
    try:
        from tensorboardX import SummaryWriter
        os.makedirs(path, exist_ok=True)
        return SummaryWriter(path)
    except ImportError:
        class _Null:
            def add_scalars(self, *a, **k): pass
            def add_scalar(self, *a, **k): pass
            def close(self): pass
        return _Null()
