"""Hybrid flash-GAT attention scale sweep on one chip.

The GCN aggregation trajectory is flat at 708-731 M edges/s from 2^20 to
2^23 (bench_scale_sweep / DESIGN §1.2b); this sweep measures the same
trajectory for ATTENTION — the r5 hybrid kernel (dense hub tiles +
remainder chunk steps in one pass, exact row softmax over every edge,
`ops/flash_gat.gat_attention_agg_hybrid`). The reference's GAT engine
caps at N <= 6144 on-chip (`matrix_mult.h:43-45`); every row here is a
graph it cannot express at any speed.

Run as ``python -m benchmarks.bench_gat_scale [log2_n ...]``
(default 20 21). ``--train`` adds the fwd+bwd+Adam step per row.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run(n_log2: int, train: bool = False, products: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import (
        powerlaw_node_classification,
        products_density_graph,
    )
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import prepare_adjacency
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_hybrid

    n = 1 << n_log2
    t0 = time.time()
    if products:
        # north-star DENSITY row (~29 real edges/node, ogbn-products
        # class — see BASELINE.md) for the ATTENTION path
        data = products_density_graph(n, num_features=8, seed=0)
    else:
        data = powerlaw_node_classification(
            n=n, avg_degree=16, num_features=8, seed=0
        )
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    gen_s = time.time() - t0

    t0 = time.time()
    # method="xla" skips the GCN tile build — this sweep measures the
    # attention layout only. Training layouts (the default) price the
    # merged-stats backward into the (tb, packed, thresh) choice.
    prep = prepare_adjacency(
        A, method="xla", for_gat=True, gat_train=train,
        build_transpose=train,
    )
    prep = jax.device_put(prep)
    prep_s = time.time() - t0
    B = prep.gat_bsr
    hybrid = prep.gat_plan is not None
    print(
        f"n=2^{n_log2} nnz={A.nnz}: gen+sort {gen_s:.1f}s "
        f"prepare {prep_s:.1f}s -> {B.num_tiles} x tb={B.tb} "
        + (f"+ {prep.gat_plan.num_chunks} chunks "
           f"({prep.gat_rest.nnz} rest edges)" if hybrid else "(full cover)"),
        flush=True,
    )
    if not hybrid:
        print("  (chooser picked full-cover tiles; sweep expects hybrid "
              "at these scales)", flush=True)
        return

    F = 32
    Wh = jax.random.normal(jax.random.PRNGKey(2), (n, F))
    s1 = jax.random.normal(jax.random.PRNGKey(3), (n,))
    s2 = jax.random.normal(jax.random.PRNGKey(4), (n,))

    def gat_step(wh, prep, s1, s2):
        o = gat_attention_agg_hybrid(
            prep.gat_plan, prep.gat_rest, s1, s2, wh, 0.2, True
        )
        return wh + o[: wh.shape[0]] * 1e-12

    sec = timed_loop(
        gat_step, Wh, consts=(prep, s1, s2), iters=12, k1=2, reps=5
    )
    print(
        f"  GAT fwd (F={F}): {sec*1e3:.2f} ms "
        f"({A.nnz/sec/1e6:.0f} M edges/s)",
        flush=True,
    )

    if train:
        X = jax.random.normal(jax.random.PRNGKey(7), (n, 128), jnp.bfloat16)
        W0 = jax.random.normal(jax.random.PRNGKey(8), (128, F)) * 0.05
        att0 = jax.random.normal(jax.random.PRNGKey(9), (2 * F,)) * 0.1
        opt = optax.adam(1e-3)

        def train_step(carry, prep, X):
            params, opt_state = carry

            def loss_fn(p):
                W, att = p
                Wh = jnp.dot(X, W.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                s1 = Wh @ att[:F]
                s2 = Wh @ att[F:]
                out = gat_attention_agg_hybrid(
                    prep.gat_plan, prep.gat_rest, s1, s2, Wh, 0.2, True
                )
                return jnp.sum(out**2) * 1e-12

            g = jax.grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, updates), opt_state)

        carry = ((W0, att0), opt.init((W0, att0)))
        sec_t = timed_loop(
            train_step, carry, consts=(prep, X), iters=8, k1=2, reps=5
        )
        print(
            f"  GAT train step (fwd+bwd+Adam): {sec_t*1e3:.2f} ms "
            f"({A.nnz/sec_t/1e6:.0f} M edges/s)",
            flush=True,
        )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    train = "--train" in sys.argv[1:]
    products = "--products" in sys.argv[1:]
    sizes = [int(a) for a in args] or [20, 21]
    for s in sizes:
        run(s, train=train, products=products)


if __name__ == "__main__":
    main()
