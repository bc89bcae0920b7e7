"""r3: validate the recalibrated cost model end-to-end at 1M nodes."""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import (
        _estimate_backend_costs,
        agg_matmul,
        prepare_adjacency,
    )
    from sgracex1_tpu.utils.roofline import cost_for_prep

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    n = 1 << 20
    data = powerlaw_node_classification(n=n, avg_degree=16, num_features=8,
                                        seed=0)
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    print(f"graph ready {time.time()-t0:.1f}s nnz={A.nnz}", flush=True)

    costs, best_tb, best_hy = _estimate_backend_costs(
        A, jnp.bfloat16, rank1=True)
    print("costs:", {k: f"{v*1e3:.2f}ms" for k, v in costs.items()},
          "best_tb", best_tb, "best_hy", best_hy, flush=True)

    t0 = time.time()
    prep = prepare_adjacency(A, method="auto", dense_max_bytes=0)
    print(f"prepare(auto): {time.time()-t0:.1f}s kind={prep.kind} "
          f"tb={prep.bsr.tb} tiles={prep.bsr.num_tiles} "
          f"inner={prep.bsr.tiles.shape[-1]} "
          f"rest={prep.rest.nnz if prep.rest is not None else 0}",
          flush=True)

    key = jax.random.PRNGKey(0)
    H = jax.random.normal(key, (A.n_cols, 128), jnp.float32)

    def bench(label, step, consts, nnz, k1=4, k2=24):
        sec = timed_loop(step, H, consts=consts, iters=k2, k1=k1, reps=5)
        print(f"  {label}: {sec*1e3:.3f} ms ({nnz/sec/1e6:.0f} M edges/s)",
              flush=True)
        return sec

    sec = bench("full agg_matmul", lambda h, p: h + agg_matmul(
        p, h) * 1e-12, (prep,), A.nnz)
    rl = cost_for_prep(prep, 128).roofline(sec)
    print(f"  roofline: {rl}", flush=True)

    from sgracex1_tpu.ops.bsr import bsr_spmm_pallas

    bench("bare tile kernel", lambda h, b: h + bsr_spmm_pallas(
        b, h)[: h.shape[0]] * 1e-12, (prep.bsr,), A.nnz)


if __name__ == "__main__":
    main()
