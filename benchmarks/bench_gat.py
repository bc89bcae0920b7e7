"""GAT attention aggregation: flash (BSR-tile fused kernel) vs edge path.

The timed op is one full single-head GAT aggregation
``softmax_row(LeakyReLU(s1 + s2^T) | A>0) @ Wh`` — the reference's
gat_mode accelerator call (sgrace.py:498-539). Reported edges/s counts
adjacency nonzeros, comparable to bench_spmm.

Usage: python benchmarks/bench_gat.py [dataset ...]
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timed_loop, load, header
from sgracex1_tpu.graph.reorder import rcm_order, permute_graph
from sgracex1_tpu.utils.roofline import cost_flash_gat
from sgracex1_tpu.ops.bsr import bsr_from_sparse
from sgracex1_tpu.ops.flash_gat import (
    flash_gat_forward,
    gat_attention_agg_fused,
    gat_attention_agg_ref,
)


def bench_dataset(name: str, F: int = 32):
    adj, X, W = load(name)
    perm = rcm_order(adj)
    adj_p, _ = permute_graph(adj, perm)
    rng = np.random.default_rng(0)
    N = adj.n_rows
    Wh = jax.device_put(rng.standard_normal((N, F)).astype(np.float32))
    s1 = jax.device_put(rng.standard_normal(N).astype(np.float32))
    s2 = jax.device_put(rng.standard_normal(N).astype(np.float32))
    A_dev = adj_p.device()
    print(f"\n{name}: N={N} nnz={adj.nnz} F={F} (RCM order)")

    def step_flash(wh, B, s1, s2):
        o = flash_gat_forward(B, s1, s2, wh)
        return wh + o[: wh.shape[0]] * 1e-12

    def step_edge(wh, A, s1, s2):
        o = gat_attention_agg_ref(A, s1, s2, wh)
        return wh + o[: wh.shape[0]] * 1e-12

    for tb in (128, 256, 512, 1024):
        B = jax.device_put(bsr_from_sparse(adj_p, tb=tb, dtype=jnp.float32))
        sec = timed_loop(step_flash, Wh, consts=(B, s1, s2), iters=1000)
        rl = cost_flash_gat(B, F).fmt(sec)
        print(
            f"  flash tb={tb:4d}: {sec * 1e3:8.4f} ms  "
            f"{adj.nnz / sec / 1e6:7.0f} M edges/s   {rl}"
        )
    sec = timed_loop(step_edge, Wh, consts=(A_dev, s1, s2), iters=300)
    print(
        f"  edge path   : {sec * 1e3:8.4f} ms  "
        f"{adj.nnz / sec / 1e6:7.0f} M edges/s"
    )

    # fwd + bwd (one training-step aggregation): fused tile kernels vs
    # the edge path — grads flow to s1, s2 and Wh
    def step_fused_grad(wh, B, s1, s2):
        g = jax.grad(
            lambda w: jnp.sum(gat_attention_agg_fused(B, s1, s2, w) ** 2)
        )(wh)
        return wh + g * 1e-12

    def step_edge_grad(wh, A, s1, s2):
        g = jax.grad(
            lambda w: jnp.sum(gat_attention_agg_ref(A, s1, s2, w) ** 2)
        )(wh)
        return wh + g * 1e-12

    for tb in (256, 512):
        B = jax.device_put(bsr_from_sparse(adj_p, tb=tb, dtype=jnp.float32))
        sec = timed_loop(step_fused_grad, Wh, consts=(B, s1, s2), iters=300)
        print(
            f"  fused fwd+bwd tb={tb:3d}: {sec * 1e3:8.4f} ms  "
            f"{adj.nnz / sec / 1e6:7.0f} M edges/s"
        )
    sec = timed_loop(step_edge_grad, Wh, consts=(A_dev, s1, s2), iters=100)
    print(
        f"  edge fwd+bwd        : {sec * 1e3:8.4f} ms  "
        f"{adj.nnz / sec / 1e6:7.0f} M edges/s"
    )


if __name__ == "__main__":
    header("GAT attention aggregation (flash vs edge path)")
    for n in sys.argv[1:] or ["citeseer", "cora", "pubmed"]:
        bench_dataset(n)
