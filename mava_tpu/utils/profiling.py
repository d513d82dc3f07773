"""Profiling hooks (a first-class feature the reference lacks — SURVEY.md §5 notes it
only measures wall-clock steps_per_second).

Enable with `arch.profile=True arch.profile_dir=<dir>`: the first post-compile learner
megastep is captured with `jax.profiler.trace` (viewable in TensorBoard / Perfetto),
and every system reports per-phase wall-clock through the logger.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def maybe_trace(config, step: int) -> Iterator[None]:
    """Trace learner step `arch.profile_step` (default 1 — after compilation) when
    `arch.profile` is set."""
    enabled = bool(config.arch.get("profile", False))
    target_step = int(config.arch.get("profile_step", 1))
    if enabled and step == target_step and jax.process_index() == 0:
        log_dir = config.arch.get("profile_dir") or "results/profile"
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


class PhaseTimer:
    """Accumulates wall-clock per phase (act+learn / eval / host) for MISC logging."""

    def __init__(self) -> None:
        self._start: Optional[float] = None
        self.phases: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - start
            )

    def metrics(self, prefix: str = "time_") -> dict:
        return {f"{prefix}{k}": v for k, v in self.phases.items()}
