"""Flash-GAT attention aggregation at the 2^20-node power-law scale.

The reference's GAT engine caps at N <= 6144 on-chip; this drives the
fused flash kernel over the FULL 1M-node adjacency (1-bit packed mask
tiles via prepare_adjacency(for_gat=True) — the >64k-node path) and
reports fwd ms / edges/s, plus the GAT train step through the fused
backward."""

import time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import prepare_adjacency
    from sgracex1_tpu.ops.flash_gat import (
        flash_gat_forward,
        gat_attention_agg_fused,
    )

    n = 1 << 20
    data = powerlaw_node_classification(n=n, avg_degree=16, num_features=8, seed=0)
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    t0 = time.time()
    prep = prepare_adjacency(
        A, method="xla", for_gat=True, build_transpose=False
    )
    B = prep.flash_tiles
    print(
        f"prepare {time.time()-t0:.0f}s: flash tiles {B.num_tiles} x tb={B.tb} "
        f"{B.tiles.dtype}[{B.tiles.shape[-1]}] "
        f"({B.tiles.size * B.tiles.dtype.itemsize / 2**20:.0f} MB)",
        flush=True,
    )
    rng = np.random.default_rng(0)
    F = 32
    Wh = jax.device_put(rng.standard_normal((n, F)).astype(np.float32))
    s1 = jax.device_put(rng.standard_normal(n).astype(np.float32))
    s2 = jax.device_put(rng.standard_normal(n).astype(np.float32))

    def step(wh, B, s1, s2):
        o = flash_gat_forward(B, s1, s2, wh)
        return wh + o[: wh.shape[0]] * 1e-12

    sec = timed_loop(step, Wh, consts=(B, s1, s2), iters=12, k1=2, reps=5)
    print(
        f"1M flash GAT fwd (F={F}): {sec*1e3:.2f} ms "
        f"({A.nnz/sec/1e6:.0f} M edges/s)",
        flush=True,
    )

    # training step through the fused backward
    import optax

    F_in = 64
    X = jax.device_put(rng.standard_normal((n, F_in)).astype(np.float32))
    params = {
        "W": jax.device_put((rng.standard_normal((F_in, F)) * 0.1).astype(np.float32)),
        "att": jax.device_put((rng.standard_normal((2 * F,)) * 0.1).astype(np.float32)),
    }
    opt = optax.adam(1e-3)

    def train_step(carry, B, X):
        params, opt_state = carry

        def loss_fn(p):
            Wh = jnp.dot(X, p["W"], preferred_element_type=jnp.float32)
            s1 = Wh @ p["att"][:F]
            s2 = Wh @ p["att"][F:]
            out = gat_attention_agg_fused(B, s1, s2, Wh, 0.2)
            return jnp.sum(out**2) * 1e-9

        g = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, updates), opt_state)

    carry = (params, opt.init(params))
    sec_t = timed_loop(train_step, carry, consts=(B, X), iters=6, k1=1, reps=3)
    print(
        f"1M flash GAT train step (fwd+bwd+Adam): {sec_t*1e3:.2f} ms "
        f"({A.nnz/sec_t/1e6:.0f} M edges/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
