"""Tracing/profiling (SURVEY.md §5.1).

The reference has nothing beyond tensorboard scalars; the build gets:
  * `jax.profiler` integration — start_server() for on-demand capture
    from tensorboard-plugin-profile, trace() for ahead-of-time traces;
  * PhaseTimers — cheap wall-clock accounting of the trainer phases
    (act / insert / update) with block_until_ready bracketing so the
    numbers mean device time, logged as scalars per log interval.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


def start_server(port: int = 9999):
    """On-demand profiling endpoint (connect tensorboard profile UI)."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a trace viewable in tensorboard-plugin-profile."""
    with jax.profiler.trace(log_dir):
        yield


class PhaseTimers:
    """Accumulate per-phase seconds between logs."""

    def __init__(self):
        self._acc: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self._acc[name] += time.perf_counter() - t0

    def pop(self) -> Dict[str, float]:
        out = dict(self._acc)
        self._acc.clear()
        return out
