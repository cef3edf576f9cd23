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


def device_benchmark(fn, *args, iters: int = 16, warmup: int = 1,
                     repeats: int = 2) -> float:
    """Mean seconds per call measured on the DEVICE via two-point slope:
    `iters` and 5x`iters` calls are chained in a lax.fori_loop with a data
    dependency (each iteration's first argument is perturbed by 0x the
    previous output, preventing CSE), both timed end-to-end, and the per-call
    time is the slope — cancelling the fixed per-dispatch cost of tunneled
    PJRT backends (~60 ms round-trip here).  This is the TPU analog of the
    reference's cudaEvent device timing (test_flash_attention2.py:293-308):
    it measures the device, not the client."""
    import functools

    import jax.numpy as jnp
    from jax import lax

    out0 = jax.jit(fn)(*args)
    init = jnp.zeros_like(jax.tree.leaves(out0)[0])

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(init, *args, n):
        def body(_, acc):
            # Real (if negligible) data dependency: x0 alone (or *0) gets
            # constant-folded and the whole body hoisted out of the loop.
            dep = (acc.ravel()[0] * 1e-30).astype(args[0].dtype)
            out = fn(args[0] + dep, *args[1:])
            leaves = jax.tree.leaves(out)
            acc_new = leaves[0]
            # EVERY output leaf must feed the carry, or XLA dead-codes the
            # unused outputs inside the loop and the measurement silently
            # times a subset of the kernel (e.g. dq without dk/dv).
            for leaf in leaves[1:]:
                extra = (leaf.ravel()[0].astype(jnp.float32) * 1e-30)
                acc_new = acc_new + extra.astype(acc_new.dtype)
            return acc_new

        return lax.fori_loop(0, n, body, init)

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            sync(run_n(init, *args, n=n))
            best = min(best, time.perf_counter() - t0)
        return best

    while True:
        n_lo, n_hi = iters, 5 * iters
        for _ in range(warmup):
            sync(run_n(init, *args, n=n_lo))
            sync(run_n(init, *args, n=n_hi))
        t_lo, t_hi = timed(n_lo), timed(n_hi)
        # Grow the loop until the slope signal clears the ~10s-of-ms relay
        # jitter, so tiny shapes are measured honestly too.
        if t_hi - t_lo > 0.05 or iters >= 2048:
            return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)
        iters *= 8


def benchmark(fn, *args, warmup: int = 1, iters: int | None = 10,
              target_time_s: float = 0.5, max_iters: int = 300, **kwargs) -> float:
    """Mean seconds per call: `warmup` untimed + `iters` timed launches,
    matching the reference harness (1 warm-up + 10 timed,
    test_flash_attention2.py:284-308).

    iters=None auto-sizes the loop to ~`target_time_s` of device work so the
    fixed per-dispatch latency of tunneled PJRT backends (~0.5 ms/call here)
    amortizes out of small-shape measurements."""
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    if iters is None:
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        t1 = max(time.perf_counter() - t0, 1e-6)
        iters = int(max(10, min(max_iters, target_time_s / t1)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    return (time.perf_counter() - t0) / iters
