"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5.1 — tqdm bars only).
Here: `maybe_trace` wraps a training epoch in a jax.profiler trace when
TRAINING.PROFILE_DIR is set (viewable in TensorBoard / Perfetto), and
`StepTimer` collects host-side step latencies with percentile summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np

from ..logging_utils import setup_logger

logger = setup_logger()


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str], enabled: bool = True) -> Iterator[None]:
    if not profile_dir or not enabled:
        yield
        return
    import jax

    logger.info("Profiling to %s", profile_dir)
    with jax.profiler.trace(profile_dir):
        yield


class StepTimer:
    """Host-side per-step latency tracker.

    Note: since the task loops went async (losses accumulate on device,
    no per-step sync), these percentiles measure DISPATCH latency, not
    device step time — the epoch's wall-clock 'seconds' field is the
    end-to-end truth; use TRAINING.PROFILE_DIR traces for device time."""

    def __init__(self) -> None:
        self.durations = []
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self) -> None:
        if self._last is not None:
            self.durations.append(time.perf_counter() - self._last)
            self._last = None

    def summary(self) -> dict:
        if not self.durations:
            return {}
        arr = np.asarray(self.durations)
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "max_s": float(arr.max()),
        }
