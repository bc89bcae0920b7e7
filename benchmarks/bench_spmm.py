"""SpMM backend sweep: dense / pallas / xla across the reference datasets.

Reports ms per aggregation (A @ H, H = X @ W materialized once) and
adjacency edges/s — comparable to the reference's %timeit run_kernel
numbers (mmult-master.ipynb cell 34: citeseer 1t1t2c = 4.65 ms).
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timed_loop, load, header
from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul
from sgracex1_tpu.utils.roofline import cost_for_prep


def bench_dataset(name: str, methods=("dense", "bsr", "hybrid", "pallas", "xla")):
    adj, X, W = load(name)
    H = jax.device_put((X @ W).astype(jnp.bfloat16))
    print(
        f"\n{name}: N={adj.n_rows} nnz={adj.nnz} P={W.shape[1]}"
    )
    for method in methods:
        try:
            prep = prepare_adjacency(adj, method=method)
            prep = jax.device_put(prep)

            def step(h, prep):
                out = agg_matmul(prep, h)
                return h.at[: out.shape[0], :].add(out.astype(h.dtype) * 1e-12)

            sec = timed_loop(step, H, consts=(prep,), iters=1000)
            eps = adj.nnz / sec
            # roofline attribution — the reference decodes FIFO stall
            # counters into "frontend fast/slow" (mmult-master cells 39-40);
            # we report achieved bytes/FLOPs vs chip peaks instead
            rl = cost_for_prep(prep, W.shape[1]).fmt(sec)
            print(
                f"  {method:7s} {sec * 1e3:8.4f} ms "
                f"{eps / 1e9:8.2f} B edges/s   {rl}"
            )
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"  {method:7s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    header("SpMM aggregation backends")
    names = sys.argv[1:] or ["mol", "cora", "citeseer", "pubmed"]
    for n in names:
        bench_dataset(n)
