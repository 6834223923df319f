"""Structured run reports + profiling hooks (SURVEY.md §5 observability).

The reference's introspection is an always-on token dump to stdout
(``/root/reference/src/mfcc/main.c:84-99``); here every corpus run emits a
machine-readable JSON report — audio-seconds processed, wall time,
audio-seconds/s per chip, accuracy vs oracle when measured, per-stage
timings, device/host counts — which feeds BASELINE.md directly.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field, asdict

import jax


@dataclass
class RunReport:
    config_hash: str = ""
    n_utterances: int = 0
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    n_devices: int = 0
    n_hosts: int = 0
    max_abs_error: float | None = None
    # appended pitch columns' own contract quantity (norm <= 3e-4),
    # reported apart from the feature tolerance above (ADVICE r4)
    max_abs_error_pitch: float | None = None
    stage_seconds: dict = field(default_factory=dict)

    @property
    def audio_seconds_per_second(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def audio_seconds_per_second_per_chip(self) -> float:
        n = max(self.n_devices, 1)
        return self.audio_seconds_per_second / n

    def finalize(self) -> dict:
        d = asdict(self)
        d["audio_seconds_per_second"] = self.audio_seconds_per_second
        d["audio_seconds_per_second_per_chip"] = (
            self.audio_seconds_per_second_per_chip)
        return d

    def dump(self, path: str | None = None) -> str:
        s = json.dumps(self.finalize(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s + "\n")
        return s


@contextlib.contextmanager
def stage_timer(report: RunReport, name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        report.stage_seconds[name] = (
            report.stage_seconds.get(name, 0.0) + time.perf_counter() - t0)


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """jax.profiler.trace wrapper; no-op when trace_dir is None."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
