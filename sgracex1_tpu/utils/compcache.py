"""Persistent XLA compilation cache for the framework's compiled programs.

The graph-prepare step compiles a handful of device programs (the bucketed
tile-build scatter, the per-(tb, P) aggregation kernels). Through this
environment's TPU relay a fresh compile costs ~15-40 s — measured 12.4 s
for the 1M-node tile build while the *identical second* build took 0.48 s
(r3 diagnostic). The in-process jit cache only helps within one process;
JAX's persistent compilation cache (verified working through the relay:
1.65 s -> 0.3 s across processes) makes prepare pay each program once per
machine instead of once per run.

The reference has no analogue — its "compile" tier is FPGA re-synthesis
(hours, `hls/gnn/solution1/script.tcl`); its runtime reprograms registers
only. Here the compile tier is real and recurring, so caching it is part
of making prepare usable at ogbn-products scale (SURVEY.md §7).

Enabled on first ``prepare_adjacency``/bench use; set
``SGRACE_NO_COMPILE_CACHE=1`` to opt out (e.g. for compile-time benchmarks).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/sgracex1_tpu/xla")
_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Idempotently point JAX's persistent compilation cache at a local
    directory. Returns True when active (now or already)."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("SGRACE_NO_COMPILE_CACHE"):
        return False
    import jax

    path = cache_dir or os.environ.get(
        "SGRACE_COMPILE_CACHE_DIR", _DEFAULT_DIR
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time; the relay
        # round trip alone makes even small programs worth keeping
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - unsupported jax version/config
        return False
    _enabled = True
    return True
