"""Multi-head hybrid flash-GAT at the 2^20-node power-law scale.

The reference's multi-head config exists but is unused
(`demo/emulation/config.py:18` "not in use"); here all H heads run
batched in ONE hybrid kernel pass (shared tile loads, per-head resident
chunk payloads — the r5 H>1 lowering fix). Reports fwd ms and
edge-head/s next to the H=1 number."""

import time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import prepare_adjacency
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_hybrid

    n = 1 << 20
    data = powerlaw_node_classification(
        n=n, avg_degree=16, num_features=8, seed=0
    )
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    t0 = time.time()
    prep = jax.device_put(prepare_adjacency(
        A, method="xla", for_gat=True, gat_train=False,
        build_transpose=False,
    ))
    B = prep.gat_bsr
    print(
        f"prepare {time.time()-t0:.1f}s: {B.num_tiles} x tb={B.tb} + "
        f"{prep.gat_plan.num_chunks} chunks",
        flush=True,
    )
    F = 32
    for H in (1, 4):
        Wh = jax.random.normal(jax.random.PRNGKey(2), (n, H, F))
        s1 = jax.random.normal(jax.random.PRNGKey(3), (n, H))
        s2 = jax.random.normal(jax.random.PRNGKey(4), (n, H))

        def step(wh, prep, s1, s2):
            o = gat_attention_agg_hybrid(
                prep.gat_plan, prep.gat_rest, s1, s2, wh, 0.2, True
            )
            return wh + o[: wh.shape[0]] * 1e-12

        sec = timed_loop(
            step, Wh, consts=(prep, s1, s2), iters=8, k1=2, reps=5
        )
        print(
            f"  H={H}: {sec*1e3:.2f} ms "
            f"({H*A.nnz/sec/1e6:.0f} M edge-heads/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
