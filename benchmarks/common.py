"""Shared benchmark helpers: relay-safe timing and dataset loading."""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    """Force device completion by pulling a scalar (block_until_ready does
    not fully sync through the TPU relay — see utils/profiling.py).
    Accepts any pytree (e.g. a (params, opt_state) carry).

    The reduction accumulates in f32 WITHOUT an explicit astype: an eager
    ``l.astype(f32)`` materializes a full-size f32 copy of the carry —
    4 GiB for a [2^23, 128] bf16 carry, which alone OOMed the 2^23
    single-chip sweep. Per-leaf scalars are summed ON DEVICE and pulled
    with ONE float() — one relay round trip per sync, not one per leaf
    (an Adam carry has ~30 leaves x ~25 ms otherwise)."""
    leaves = jax.tree_util.tree_leaves(x)
    total = sum(jnp.sum(l, dtype=jnp.float32) for l in leaves)
    return float(total)


def timed_loop(
    step: Callable, init, *, consts=(), iters: int = 1000,
    k1: int | None = None, reps: int = 7,
) -> float:
    """Median seconds/iteration amortized inside one jit (fori_loop with a
    data dependence). Two-point estimator: the difference between a k1- and
    an iters-iteration loop divides out the relay round-trip overhead, and
    both counts are large enough that the work difference dwarfs relay
    jitter (a (k, 1) estimator is not — see bench.py timed_loop).

    ``consts`` (any pytree of arrays, e.g. a PreparedAdjacency) is passed as
    a jit ARGUMENT, not closed over: jit embeds closure-captured arrays into
    the compiled program, which ships the whole adjacency to the remote
    compiler (HTTP 413 at pubmed size) and distorts what is measured."""
    if k1 is None:
        k1 = max(iters // 6, 1)

    def run(k):
        @jax.jit
        def f(x0, consts):
            return jax.lax.fori_loop(
                0, k, lambda i, x: step(x, *consts), x0
            )

        sync(f(init, consts))
        ts = []
        for _ in range(reps):
            t = time.time()
            sync(f(init, consts))
            ts.append(time.time() - t)
        return float(np.median(ts))

    return (run(iters) - run(k1)) / (iters - k1)


def load(name: str):
    """(adj, X_dense, W) for a reference dataset."""
    from sgracex1_tpu.graph import io

    adj, fea, w = io.load_reference_dataset(name)
    X = np.asarray(fea.to_dense()).astype(np.float32)
    return adj, X, w.astype(np.float32)


def header(title: str):
    print(f"\n=== {title} (backend: {jax.default_backend()}) ===")
