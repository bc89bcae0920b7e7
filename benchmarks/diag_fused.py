"""On-chip A/B: fused tile+remainder+scaling kernel vs the r3 composition
(bare tile kernel + Hs pass + XLA remainder scatter + out-scale pass) at
the 2^20-node power-law scale."""
import dataclasses
import time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import agg_matmul, prepare_adjacency

    n = 1 << 20
    data = powerlaw_node_classification(n=n, avg_degree=16, num_features=8, seed=0)
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    t0 = time.time()
    prep = prepare_adjacency(A, method="auto", dense_max_bytes=0)
    print(f"prepare {time.time()-t0:.1f}s kind={prep.kind} "
          f"tiles={prep.bsr.num_tiles} tb={prep.bsr.tb} "
          f"rest={prep.rest.nnz if prep.rest is not None else 0} "
          f"chunks={prep.fused.num_rest_chunks if prep.fused else 0} "
          f"K={prep.fused.K if prep.fused else 0}", flush=True)
    prep_old = dataclasses.replace(prep, fused=None, fused_t=None)

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        H = jax.random.normal(jax.random.PRNGKey(0), (n, 128), dt)

        def agg_step(h, p):
            return h + agg_matmul(p, h) * 1e-12

        for label, p in (("fused", prep), ("old", prep_old)):
            sec = timed_loop(agg_step, H, consts=(p,), iters=24, k1=4, reps=5)
            print(f"  H={name} {label}: {sec*1e3:.3f} ms "
                  f"({A.nnz/sec/1e6:.1f} M edges/s)", flush=True)

    # backward too (fused transposed schedule)
    H = jax.random.normal(jax.random.PRNGKey(0), (n, 128), jnp.bfloat16)
    V = jax.random.normal(jax.random.PRNGKey(1), (n, 128), jnp.bfloat16)

    def grad_step(h, p, v):
        g = jax.grad(lambda hh: jnp.vdot(agg_matmul(p, hh).astype(jnp.float32), v.astype(jnp.float32)))(h)
        return h + g * 1e-12

    for label, p in (("fused", prep), ("old", prep_old)):
        sec = timed_loop(grad_step, H, consts=(p, V), iters=12, k1=2, reps=5)
        print(f"  fwd+bwd {label}: {sec*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
