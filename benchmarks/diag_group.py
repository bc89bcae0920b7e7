"""On-chip A/B: grouped-output fused kernel (group row blocks per output
block — fewer output-drain transitions, DESIGN §1.2d) vs group=1 at the
2^20-node power-law scale. Exactness is asserted against group=1 on the
first run of each group size."""
import time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from benchmarks.common import timed_loop, sync
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import prepare_adjacency
    from sgracex1_tpu.ops.fused_agg import bsr_spmm_fused

    n = 1 << 20
    data = powerlaw_node_classification(
        n=n, avg_degree=16, num_features=8, seed=0
    )
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    t0 = time.time()
    prep = prepare_adjacency(A, method="auto", dense_max_bytes=0)
    plan = jax.device_put(prep.fused)
    print(
        f"prepare {time.time()-t0:.1f}s tiles={prep.bsr.num_tiles} "
        f"tb={prep.bsr.tb} chunks={plan.num_rest_chunks} "
        f"steps={plan.num_steps} n_rt={prep.bsr.n_row_tiles}",
        flush=True,
    )
    H = jax.random.normal(jax.random.PRNGKey(0), (n, 128), jnp.bfloat16)

    ref = None
    for g in (1, 2, 4, 8):
        def step(h, plan):
            return h + bsr_spmm_fused(plan, h, group=g) * 1e-12

        # exactness first (bit-identical math, only drain batching moves)
        o = jax.jit(
            lambda p, h: bsr_spmm_fused(p, h, group=g)
        )(plan, H)
        if ref is None:
            ref = np.asarray(o)
        else:
            d = float(np.abs(np.asarray(o) - ref).max())
            print(f"  group={g} max|diff| vs group=1: {d}", flush=True)
            assert d == 0.0, d
        sec = timed_loop(step, H, consts=(plan,), iters=24, k1=4, reps=5)
        print(
            f"  group={g}: {sec*1e3:.3f} ms "
            f"({A.nnz/sec/1e6:.1f} M edges/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
