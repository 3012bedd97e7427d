"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock prints and tqdm bars
(SURVEY.md §5). Here: `jax.profiler` traces viewable in
TensorBoard/Perfetto, and a per-step timer that truly fences device work
(on tunneled runtimes `block_until_ready` may not; a scalar host readback
always does).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a code block.

    View with TensorBoard (`tensorboard --logdir <log_dir>`) or upload the
    .trace.json.gz to Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(x=None) -> None:
    """Force completion of all queued device work via a host readback."""
    if x is not None:
        leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
        if leaves:
            np.asarray(jax.device_get(jnp.sum(leaves[0].ravel()[:1])))
            return
    np.asarray(jax.device_get(jnp.zeros(())))


class StepTimer:
    """Rolling per-step timing with true device fencing.

    >>> timer = StepTimer()
    >>> for batch in data:
    ...     state, _ = train_step(state, batch)
    ...     timer.tick(state)         # fences on the new state
    >>> timer.summary()
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._last = None
        self._count = 0

    def tick(self, result=None):
        fence(result)
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        t = np.asarray(self.times)
        return {"steps": len(t), "mean_s": float(t.mean()),
                "p50_s": float(np.median(t)), "min_s": float(t.min()),
                "max_s": float(t.max()),
                "steps_per_sec": float(1.0 / t.mean())}
