"""Metrics / logging / observability (SURVEY.md §5.5).

The reference prints scalars ad hoc (optionally gpflow.monitor/TensorBoard).
Here: a tiny metric writer that accumulates scalar series, prints
periodically, and optionally dumps JSONL; plus profiling helpers around
``jax.profiler`` (SURVEY.md §5.1 — cheap because the train step is one
jitted function).
"""

from __future__ import annotations

import contextlib
import json
import time


class MetricWriter:
    def __init__(self, log_every=100, jsonl_path=None, verbose=True):
        self.log_every = log_every
        self.jsonl_path = jsonl_path
        self.verbose = verbose
        self.history = []
        self._t0 = time.time()

    def write(self, step, **scalars):
        rec = {"step": int(step), "wall": time.time() - self._t0}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.history.append(rec)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.verbose and step % self.log_every == 0:
            parts = " ".join(f"{k}={v:.5g}" for k, v in rec.items()
                             if k not in ("step", "wall"))
            print(f"[{rec['wall']:8.1f}s] step {step:6d} {parts}",
                  flush=True)


@contextlib.contextmanager
def profile_trace(logdir):
    """Capture a jax.profiler trace around a block (view in TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock timing with warmup discard."""

    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._last = None

    def tick(self):
        now = time.time()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean(self):
        ts = self.times[self.warmup:]
        return sum(ts) / max(len(ts), 1)
