"""Full GNN layer benchmarks: GCN / GAT forward and train-step timing on the
reference datasets — the analogue of the reference's per-layer profiling
(sgrace.py:423-558)."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timed_loop, load, header
from sgracex1_tpu.ops.dispatch import prepare_adjacency
from sgracex1_tpu.nn.models import GCNModel, GATModel


def bench_model(name: str, cls, dataset: str = "citeseer", hidden: int = 64):
    adj, X, _ = load(dataset)
    prep = jax.device_put(prepare_adjacency(adj))
    x = jax.device_put(jnp.asarray(X))
    model = cls(num_features=X.shape[1], hidden_channels=hidden, num_classes=8)
    params = model.init(jax.random.PRNGKey(0), prep, x)

    def fwd(xv):
        out = model.apply(params, prep, xv)
        return xv.at[:, : out.shape[1]].add(out * 1e-12)

    sec = timed_loop(fwd, x, iters=20)
    print(f"  {name:12s} fwd  {sec * 1e3:8.3f} ms")

    y = jax.device_put(jnp.zeros(X.shape[0], jnp.int32))

    def train_step(xv):
        def loss_fn(p):
            logits = model.apply(p, prep, xv)
            ls = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), y]
            return jnp.mean(ls)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(g)
        bump = sum(jnp.sum(jnp.abs(l)) for l in leaves)
        return xv + bump * 1e-20

    sec = timed_loop(train_step, x, iters=20)
    print(f"  {name:12s} grad {sec * 1e3:8.3f} ms")


if __name__ == "__main__":
    header("GNN layer / model benchmarks (citeseer, hidden=64)")
    bench_model("GCN 2-layer", GCNModel)
    bench_model("GAT 2-layer", GATModel)
