"""Distributed full GCN training step (fwd+bwd) scaling — BASELINE.json
config 5 at reduced scale.

An ogbn-products-shaped power-law graph is row-sharded over a 1D mesh with
boundary-only halo exchange; the timed unit is one jitted Adam training
step of a 2-layer GCN (forward, backward, update). Reports edges/s and
scaling efficiency vs 1 device. On CI this runs on a virtual CPU mesh; on
a TPU slice the identical code runs over ICI/DCN.

Usage: python benchmarks/bench_dist_train.py [n] [avg_degree]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from benchmarks.common import timed_loop, header
from sgracex1_tpu.graph.datasets import powerlaw_node_classification
from sgracex1_tpu.graph.normalize import sym_norm
from sgracex1_tpu.graph.reorder import (
    degree_balanced_order,
    permute_graph,
    shard_edge_counts,
)
from sgracex1_tpu.parallel.halo import build_halo, dist_gnn_layer_halo
from sgracex1_tpu.parallel.mesh import make_mesh
from sgracex1_tpu.parallel.partition import pad_nodes


def bench(n_devices, data, A, base_eps=None, *, balance=True,
          decompose=False):
    if balance and n_devices > 1:
        perm = degree_balanced_order(A, n_devices)
        A_s, _ = permute_graph(A, perm)
        x_np, y_np = data.x[perm], data.y[perm]
        m_np = data.train_mask[perm]
    else:
        A_s, x_np, y_np, m_np = A, data.x, data.y, data.train_mask

    mesh = make_mesh(n_devices)
    G, n_pad = build_halo(A_s, n_devices)
    sh = NamedSharding(mesh, P("graph"))
    x = jax.device_put(pad_nodes(x_np, n_pad), sh)
    y = jax.device_put(pad_nodes(y_np.astype(np.int32), n_pad), sh)
    m = jax.device_put(pad_nodes(m_np.astype(np.float32), n_pad), sh)
    G = jax.device_put(G, sh)

    f, h, c = data.num_features, 64, data.num_classes
    rng = np.random.default_rng(0)
    params = {
        "W1": jnp.asarray(rng.standard_normal((f, h)).astype(np.float32) * 0.1),
        "W2": jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.1),
        "Wo": jnp.asarray(rng.standard_normal((h, c)).astype(np.float32) * 0.1),
    }
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    def make_train_step(exchange):
        def train_step(carry, G, x, y, m):
            params, opt_state = carry

            def loss_fn(p):
                hdn = dist_gnn_layer_halo(
                    mesh, G, x, p["W1"], relu=True, exchange=exchange
                )
                hdn = dist_gnn_layer_halo(
                    mesh, G, hdn, p["W2"], relu=True, exchange=exchange
                )
                logits = hdn @ p["Wo"]
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                )
                return jnp.sum(ls * m) / jnp.sum(m)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state)

        return train_step

    sec = timed_loop(
        make_train_step(True), (params, opt_state), consts=(G, x, y, m),
        iters=30,
    )
    if decompose and n_devices > 1:
        # no-exchange ablation: identical shapes/compute, collective
        # replaced by the local buffer -> the difference IS the collective
        sec_nx = timed_loop(
            make_train_step(False), (params, opt_state),
            consts=(G, x, y, m), iters=30,
        )
        from sgracex1_tpu.parallel.comm_model import halo_comm

        # 2 layers, fwd + transposed bwd each
        comm = halo_comm(G, 64, backward=True) + halo_comm(G, 64, backward=True)
        print(
            f"    decompose: full {sec*1e3:8.2f} ms  no-exchange "
            f"{sec_nx*1e3:8.2f} ms  -> collective {max(sec-sec_nx,0)*1e3:6.2f}"
            f" ms/step over {comm.bytes_out/1e6:.2f} MB/dev "
            f"({comm.bytes_out/max(sec-sec_nx,1e-12)/1e9:.1f} GB/s effective)"
        )
    # fwd (2 layers) + bwd (2 transposed layers) touch each edge 4x/step,
    # but report plain adjacency edges/s for comparability with bench_spmm
    eps = A.nnz / sec
    tag = "bal" if (balance and n_devices > 1) else "raw"
    eff = (
        ""
        if base_eps is None
        else f"  eff {eps / (base_eps * n_devices) * 100:5.1f}%"
    )
    print(
        f"  {n_devices} dev [{tag}]: {sec * 1e3:8.2f} ms/step  "
        f"{eps / 1e6:7.1f} M edges/s{eff}"
    )
    return eps


def main_large(n_log2: int = 22, d: int = 16, ndev: int = 8):
    """North-star-scale distributed prepare + train step (VERDICT r3 #3).

    Runs the FULL distributed prepare at 2^n_log2 nodes — vectorized
    build_halo, global rank-1 detection, and the per-shard fused tile
    plans at single-chip generation (1-bit packed masks + remainder
    chunks, parallel/halo_fused) — printing prepare seconds, plan bytes,
    and the exact halo bytes/device. The timed training step runs the
    edge path: on the virtual CPU mesh the Pallas kernels would run in
    interpret mode, which unrolls the (thousands-step) grid at trace
    time; the fused plans execute on real chips (and are parity-tested
    at CI scale in tests/test_halo_fused.py).
    """
    import time

    from sgracex1_tpu.graph.normalize import rank1_factor
    from sgracex1_tpu.parallel.comm_model import halo_comm
    from sgracex1_tpu.parallel.halo_fused import build_halo_fused

    n = 1 << n_log2
    header(f"LARGE distributed prepare + train (n=2^{n_log2}, {ndev} dev)")
    t0 = time.time()
    data = powerlaw_node_classification(
        n=n, avg_degree=d, num_features=16, seed=0
    )
    A = sym_norm(data.edge_index, data.num_nodes)
    perm = degree_balanced_order(A, ndev)
    A_s, _ = permute_graph(A, perm)
    gen_s = time.time() - t0
    print(f"  graph: n={n} nnz={A.nnz}  gen+balance {gen_s:.1f}s",
          flush=True)

    t0 = time.time()
    fac = rank1_factor(A_s)
    rank1_s = time.time() - t0
    t0 = time.time()
    G, n_pad = build_halo(A_s, ndev)
    halo_s = time.time() - t0
    t0 = time.time()
    FP = build_halo_fused(G, rank1_factors=fac)  # cost-model tb + auto K
    fused_s = time.time() - t0
    tile_mb = FP.tiles.size * FP.tiles.dtype.itemsize / 1e6
    prep_total = rank1_s + halo_s + fused_s
    print(
        f"  prepare: rank1 {rank1_s:.1f}s + build_halo {halo_s:.1f}s + "
        f"fused plans {fused_s:.1f}s = {prep_total:.1f}s "
        f"(tiles [{','.join(map(str, FP.tiles.shape))}] "
        f"{FP.tiles.dtype} = {tile_mb:.0f} MB/direction)",
        flush=True,
    )
    comm = halo_comm(G, 64, backward=True)
    print(
        f"  halo comm (2-layer fwd+bwd, F=64): "
        f"{2 * comm.bytes_out / 1e6:.1f} MB/device/step",
        flush=True,
    )

    # timed training step (edge path — see docstring)
    mesh = make_mesh(ndev)
    sh = NamedSharding(mesh, P("graph"))
    x = jax.device_put(pad_nodes(data.x[perm], n_pad), sh)
    y = jax.device_put(
        pad_nodes(data.y[perm].astype(np.int32), n_pad), sh
    )
    m = jax.device_put(
        pad_nodes(data.train_mask[perm].astype(np.float32), n_pad), sh
    )
    G_d = jax.device_put(G, sh)
    f, h, c = data.num_features, 64, data.num_classes
    rng = np.random.default_rng(0)
    params = {
        "W1": jnp.asarray(rng.standard_normal((f, h)).astype(np.float32) * 0.1),
        "W2": jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.1),
        "Wo": jnp.asarray(rng.standard_normal((h, c)).astype(np.float32) * 0.1),
    }
    opt = optax.adam(0.01)

    def train_step(carry, G, x, y, m):
        params, opt_state = carry

        def loss_fn(p):
            hdn = dist_gnn_layer_halo(mesh, G, x, p["W1"], relu=True)
            hdn = dist_gnn_layer_halo(mesh, G, hdn, p["W2"], relu=True)
            logits = hdn @ p["Wo"]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * m) / jnp.sum(m)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state)

    sec = timed_loop(
        train_step, (params, opt.init(params)), consts=(G_d, x, y, m),
        iters=4, k1=1, reps=2,
    )
    print(
        f"  {ndev} dev train step (2-layer GCN fwd+bwd+Adam, edge path): "
        f"{sec*1e3:.0f} ms/step  ({A.nnz/sec/1e6:.1f} M edges/s)",
        flush=True,
    )


def main():
    if "--large" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        main_large(*(int(a) for a in args[:3]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    data = powerlaw_node_classification(n=n, avg_degree=d)
    A = sym_norm(data.edge_index, data.num_nodes)
    counts = shard_edge_counts(A, 8)
    header(
        f"distributed GCN train step (N={n}, E={A.nnz}, "
        f"raw 8-shard imbalance {counts.max() / counts.mean():.2f}x)"
    )
    if jax.devices()[0].platform == "cpu":
        print(
            "  NOTE: virtual CPU mesh — all devices share one physical CPU,"
            " so 'eff' measures sharding OVERHEAD only; real scaling"
            " efficiency requires a physical multi-chip slice."
        )
    base = bench(1, data, A)
    for ndev in (2, 4, 8):
        if ndev <= jax.device_count():
            bench(ndev, data, A, base, balance=False)
            bench(ndev, data, A, base, balance=True, decompose=True)


if __name__ == "__main__":
    main()
