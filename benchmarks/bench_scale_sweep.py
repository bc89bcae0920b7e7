"""Scale sweep: hybrid aggregation at 2^20 and 2^22 nodes on one chip.

The ogbn-products north star is ~2.4M nodes / ~123M edges; this sweep
measures the single-chip aggregation + prepare cost trajectory the
distributed path (parallel/halo.py) builds on. Run as
``python -m benchmarks.bench_scale_sweep [log2_n ...]``.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _t(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def run(n_log2: int, avg_degree: int = 16, products: bool = False):
    import jax
    import jax.numpy as jnp

    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import (
        powerlaw_node_classification,
        products_density_graph,
    )
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import agg_matmul, prepare_adjacency
    from sgracex1_tpu.utils.roofline import cost_for_prep

    n = 1 << n_log2
    t0 = time.time()
    if products:
        # north-star DENSITY row: ring-lattice locality + power-law tail,
        # ~29 real edges/node (ogbn-products class) — see
        # graph/datasets.products_density_graph
        data = products_density_graph(n, num_features=8, seed=0)
    else:
        data = powerlaw_node_classification(
            n=n, avg_degree=avg_degree, num_features=8, seed=0
        )
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    gen_s = time.time() - t0
    t0 = time.time()
    # inference-only prep: the sweep measures aggregation, and skipping the
    # transposed tile plan halves tile HBM — the difference between P=128
    # fitting at 2^22 nodes or not
    prep = prepare_adjacency(
        A, method="auto", dense_max_bytes=0, build_transpose=False
    )
    prep_s = time.time() - t0
    tile_stats = (
        f"tb={prep.bsr.tb} tiles={prep.bsr.num_tiles}"
        if prep.bsr is not None
        else "(no tile plan)"
    )
    print(
        f"n=2^{n_log2} nnz={A.nnz}: gen+sort {gen_s:.1f}s "
        f"prepare {prep_s:.1f}s -> {prep.kind} {tile_stats} "
        f"rest={prep.rest.nnz if prep.rest is not None else 0}",
        flush=True,
    )

    # bf16 features: f32 H plus working copies exhaust HBM at 2^22 with
    # f32 (observed r3). P=64 measured 1.9x SLOWER per edge than P=128 —
    # half-wide blocks waste half of every 128-lane vreg.
    P = 128
    H = jax.random.normal(
        jax.random.PRNGKey(0), (A.n_cols, P), jnp.bfloat16
    )

    ms = jax.devices()[0].memory_stats() or {}
    if ms.get("bytes_in_use"):  # the relay backend reports no stats
        print(f"  hbm in use after prepare: "
              f"{ms['bytes_in_use']/2**30:.2f} GiB", flush=True)

    def step(h, p):
        # carry = the aggregation output itself: sym-normalized A has
        # spectral radius <= 1, so iterates stay bounded, and the loop
        # holds only TWO [N, P] buffers (h + out) — the old
        # ``h + out*eps`` form kept a third and OOMed HBM at 2^23
        return agg_matmul(p, h)

    k2 = max(4, min(24, int(2e9 / max(A.nnz, 1))))
    try:
        sec = timed_loop(step, H, consts=(prep,), iters=k2,
                         k1=max(2, k2 // 6), reps=5)
    except Exception as e:  # noqa: BLE001 — fori carry OOM at 2^23
        # the two-point fori harness holds an extra carry + slice
        # buffers; fall back to median single calls minus the measured
        # relay round trip (conservative: includes per-call transfers)
        print(f"  fori harness failed ({type(e).__name__}); "
              "single-call fallback", flush=True)
        f1 = jax.jit(
            lambda p, h: jnp.sum(agg_matmul(p, h), dtype=jnp.float32)
        )
        triv = jax.jit(lambda h: jnp.sum(h[:8, :8], dtype=jnp.float32))
        float(f1(prep, H)); float(triv(H))
        base = np.median([_t(lambda: float(triv(H))) for _ in range(10)])
        call = np.median([_t(lambda: float(f1(prep, H))) for _ in range(10)])
        sec = max(call - base, 1e-9)
    rl = cost_for_prep(prep, P, h_itemsize=2).roofline(sec)
    print(
        f"  agg: {sec*1e3:.3f} ms  ({A.nnz/sec/1e6:.0f} M edges/s, "
        f"SOL {rl['pct_sol']}% of {rl['sol_bound']})",
        flush=True,
    )


if __name__ == "__main__":
    # usage: bench_scale_sweep [--degree D] [--products] n_log2 ...
    argv = sys.argv[1:]
    deg = 16
    products = "--products" in argv
    argv = [a for a in argv if a != "--products"]
    if "--degree" in argv:
        i = argv.index("--degree")
        deg = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sizes = [int(a) for a in argv] or [20, 22]
    for s in sizes:
        run(s, avg_degree=deg, products=products)
