"""Profiling + throughput counters (SURVEY §5: the reference has none —
its progress reporting is tqdm + carriage-return prints).

* `trace(logdir)` — context manager around `jax.profiler` for device
  traces (view in TensorBoard / Perfetto). Enable for a window of steps:

      with profiler.trace("runs/exp1/profile"):
          state, losses = train_step(...)

* `StepTimer` — wall-clock step timing + audio-seconds-per-second
  throughput (the BASELINE metric) with exponential smoothing.
* `nan_guard(tree, name)` — optional finite check on loss/grad trees
  (the functional analogue of the reference's scattered NaN asserts,
  `model/UNet_onset.py:146-147`). Enable via RECONVAT_NAN_CHECKS=1.
"""
from __future__ import annotations

import contextlib
import os
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, audio_seconds_per_step: float = 0.0,
                 smoothing: float = 0.9):
        self.audio_seconds_per_step = audio_seconds_per_step
        self.smoothing = smoothing
        self._last = None
        self.step_time = None
        self.steps = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (dt if self.step_time is None else
                              self.smoothing * self.step_time
                              + (1 - self.smoothing) * dt)
        self._last = now
        self.steps += 1

    @property
    def steps_per_sec(self):
        return 1.0 / self.step_time if self.step_time else 0.0

    @property
    def audio_realtime_factor(self):
        """Audio-seconds processed per wall-clock second."""
        return self.audio_seconds_per_step * self.steps_per_sec

    def summary(self) -> str:
        if not self.step_time:
            return "step timer: warming up"
        s = (f"step {self.step_time * 1000:.1f} ms "
             f"({self.steps_per_sec:.2f} steps/s")
        if self.audio_seconds_per_step:
            s += f", {self.audio_realtime_factor:.0f}x realtime"
        return s + ")"


def nan_checks_enabled() -> bool:
    return bool(os.environ.get("RECONVAT_NAN_CHECKS"))


def nan_guard(tree, name: str = "loss"):
    """Host-side finite check over a pytree of scalars/arrays."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            key = "/".join(str(p) for p in path)
            raise FloatingPointError(
                f"{name}[{key}] is not finite "
                f"(min={np.nanmin(arr)}, max={np.nanmax(arr)}); if this is "
                f"VAT, tune down XI (reference guidance, "
                f"model/UNet_onset.py:146)")
