"""Profiling and telemetry.

The reference instruments FIFO stall counters in fabric
(check_fifo_*, kernelMatrixmult_all.cpp:1018-1291) plus host wall-clock
timers behind config.profiling and a max_fea range-telemetry register
(sgrace.py:506-520). TPU-native equivalents: jax.profiler traces, relay-safe
amortized timers, and edges/s throughput accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np


class Timer:
    """Wall-clock timer that forces device completion via host readback.

    `block_until_ready` does not fully sync through the TPU relay used in
    this environment (see .claude/skills/verify/SKILL.md); pulling a scalar
    to the host does.
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._t0
        return False


def sync(x) -> float:
    """Force full device completion; returns a checksum."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def timed_amortized(
    step: Callable, init, *, iters: int = 100, reps: int = 5
) -> float:
    """Median seconds per iteration of `step`, amortized inside one jit
    (fori_loop with data dependence), with the 1-iteration baseline
    subtracted — the only reliable timing method through the relay."""
    import jax
    import jax.numpy as jnp

    def run(k):
        @jax.jit
        def f(x0):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), x0)

        sync(f(init))
        ts = []
        for _ in range(reps):
            t = time.time()
            sync(f(init))
            ts.append(time.time() - t)
        return float(np.median(ts))

    return (run(iters) - run(1)) / (iters - 1)


def edges_per_second(nnz: int, seconds: float) -> float:
    return nnz / seconds if seconds > 0 else float("inf")


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace scope (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
