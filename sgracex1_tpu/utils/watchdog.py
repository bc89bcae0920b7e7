"""Deadline watchdog for device operations.

The reference spin-polls AP_DONE with no timeout (sgrace.py:488-491) and
hangs forever if the accelerator stalls; SURVEY.md §5 flags failure
detection as a gap to close. The TPU relay used in this environment can
genuinely wedge (device enumeration succeeds, execution never completes),
so hangs are a real failure mode here, not a theoretical one.

``run_with_deadline`` executes a callable in a daemon thread and raises
``DeviceTimeout`` if it does not finish in time — the caller decides
whether to retry, fall back to CPU, or abort. It cannot *cancel* the stuck
device call (no portable way to do that), but it lets the process report
and exit instead of hanging a driver or CI job.
"""

from __future__ import annotations

import threading
from typing import Any, Callable


class DeviceTimeout(TimeoutError):
    """A device operation exceeded its deadline (hung device/relay)."""


def run_with_deadline(fn: Callable[[], Any], seconds: float) -> Any:
    """Run ``fn()`` with a wall-clock deadline; raise DeviceTimeout on miss."""
    result: list = []
    error: list = []

    def worker():
        try:
            result.append(fn())
        except BaseException as e:  # noqa: BLE001 — reraised in caller
            error.append(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        raise DeviceTimeout(
            f"device operation exceeded {seconds:.0f}s deadline "
            "(hung device or relay)"
        )
    if error:
        raise error[0]
    return result[0]


def device_alive(seconds: float = 30.0) -> bool:
    """Quick liveness probe: a trivial computation must complete in time."""

    def probe():
        import jax.numpy as jnp

        return float(jnp.sum(jnp.ones((8, 8))))

    try:
        return run_with_deadline(probe, seconds) == 64.0
    except (DeviceTimeout, Exception):  # noqa: BLE001
        return False


def device_alive_retry(
    attempts: int = 3, seconds: float = 60.0, backoff_s: float = 5.0
) -> bool:
    """Liveness probe with retries — relay hangs are usually transient
    (a single-probe abort cost round 1 its perf record). Each attempt gets
    its own deadline; between attempts we sleep ``backoff_s`` to let a
    wedged relay connection recover."""
    import time

    for i in range(attempts):
        if device_alive(seconds):
            return True
        if i + 1 < attempts:
            time.sleep(backoff_s * (i + 1))
    return False
