"""Device timing utilities.

TPU replacement for the reference's cudaEvent/chrono timer stack
(/root/reference/include/timer.h:11-164): wall timing brackets
``jax.block_until_ready`` (the TPU analog of cudaEventSynchronize), with the
reference harness's discipline of warm-up launches + averaged timed runs
(test_flash_attention2.py:284-308). Per-kernel device time can be taken from
``jax.profiler.trace`` when a finer breakdown is needed.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np


def sync(out):
    """Force device completion. `jax.block_until_ready` alone is not
    sufficient on tunneled/remote PJRT backends (buffers are futures that
    report ready immediately); reading one element back to the host is —
    the device executes queued work in order, so the last result's readback
    fences everything before it."""
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


@dataclasses.dataclass
class Timer:
    """Accumulating timer — the TimerManager analog (timer.h:118-164)."""

    total_s: float = 0.0
    runs: int = 0
    _t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            sync(result)
        assert self._t0 is not None, "Timer.stop() without start()"
        self.total_s += time.perf_counter() - self._t0
        self.runs += 1
        self._t0 = None

    @property
    def mean_ms(self) -> float:
        return 1e3 * self.total_s / max(self.runs, 1)


def benchmark(fn, *args, warmup: int = 1, iters: int = 10, **kwargs) -> float:
    """Mean seconds per call: `warmup` untimed + `iters` timed launches,
    matching the reference harness (1 warm-up + 10 timed,
    test_flash_attention2.py:284-308)."""
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    return (time.perf_counter() - t0) / iters
