"""Power-law (ogbn-products-shaped) graphs: generator invariants,
degree-balanced partitioning, OGB raw-format loader, and distributed
training parity on skewed graphs — BASELINE.json config 5 machinery.
"""

import gzip
import json

import numpy as np
import pytest

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.graph.datasets import (
    convert_ogb_raw,
    load_ogb_node,
    powerlaw_node_classification,
)
from sgracex1_tpu.graph.normalize import sym_norm
from sgracex1_tpu.graph.reorder import (
    degree_balanced_order,
    permute_graph,
    shard_edge_counts,
)


def test_powerlaw_generator_skew():
    data = powerlaw_node_classification(n=4096, avg_degree=12, seed=1)
    assert data.x.shape == (4096, 100)
    # undirected
    ei = data.edge_index
    es = set(map(tuple, ei.T))
    assert all((b, a) in es for a, b in list(es)[:200])
    deg = np.bincount(ei[0], minlength=4096)
    # power-law: max degree far above the mean
    assert deg.max() > 10 * deg.mean()
    # splits partition the nodes
    assert (
        data.train_mask.astype(int)
        + data.val_mask.astype(int)
        + data.test_mask.astype(int)
        == 1
    ).all()


def test_degree_balanced_order_reduces_imbalance():
    data = powerlaw_node_classification(n=4096, avg_degree=12, seed=2)
    A = sym_norm(data.edge_index, data.num_nodes)
    raw = shard_edge_counts(A, 8)
    perm = degree_balanced_order(A, 8)
    assert sorted(perm) == list(range(4096))  # a permutation
    A_b, _ = permute_graph(A, perm)
    bal = shard_edge_counts(A_b, 8)
    assert bal.max() / bal.mean() < raw.max() / raw.mean()
    assert bal.max() / bal.mean() < 1.3  # near-even shards
    assert bal.sum() == raw.sum()


def test_dist_training_on_skewed_graph_matches_single():
    """Full fwd+bwd GCN gradients through the halo layer on a balanced
    power-law partition must match the single-device dense computation."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgracex1_tpu.parallel.halo import build_halo, dist_gnn_layer_halo
    from sgracex1_tpu.parallel.mesh import make_mesh
    from sgracex1_tpu.parallel.partition import pad_nodes

    n_dev = min(4, jax.device_count())
    data = powerlaw_node_classification(
        n=256, avg_degree=8, num_features=12, num_classes=3, seed=3
    )
    A = sym_norm(data.edge_index, data.num_nodes)
    perm = degree_balanced_order(A, n_dev)
    A_b, _ = permute_graph(A, perm)
    x_np = data.x[perm]

    mesh = make_mesh(n_dev)
    G, n_pad = build_halo(A_b, n_dev)
    sh = NamedSharding(mesh, P("graph"))
    x = jax.device_put(pad_nodes(x_np, n_pad), sh)
    G = jax.device_put(G, sh)
    rng = np.random.default_rng(0)
    W1 = jnp.asarray(rng.standard_normal((12, 16)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32) * 0.1)

    def loss_dist(W1, W2):
        h = dist_gnn_layer_halo(mesh, G, x, W1, relu=True)
        h = dist_gnn_layer_halo(mesh, G, h, W2, relu=False)
        return jnp.sum(h**2)

    def loss_ref(W1, W2):
        Ad = jnp.asarray(A_b.to_dense()[:n_pad, :n_pad])
        xd = jnp.asarray(pad_nodes(x_np, n_pad))
        h = jnp.maximum(Ad @ (xd @ W1), 0.0)
        h = Ad @ (h @ W2)
        return jnp.sum(h**2)

    ld, gd = jax.value_and_grad(loss_dist, argnums=(0, 1))(W1, W2)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(W1, W2)
    np.testing.assert_allclose(float(ld), float(lr), rtol=1e-4)
    for a, b in zip(gd, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_ogb_raw_roundtrip(tmp_path):
    """Fabricate the OGB raw csv.gz layout, convert, and reload via the
    processed.npz fast path."""
    rng = np.random.default_rng(0)
    root = tmp_path
    (root / "raw").mkdir()
    (root / "split" / "sales").mkdir(parents=True)
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    x = rng.standard_normal((4, 6)).astype(np.float32)
    y = np.array([[0], [1], [1], [0]])

    def write_gz(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)

    write_gz(root / "raw" / "edge.csv.gz", edges, "%d")
    write_gz(root / "raw" / "node-feat.csv.gz", x, "%.6f")
    write_gz(root / "raw" / "node-label.csv.gz", y, "%d")
    for k, idx in dict(train=[0, 1], valid=[2], test=[3]).items():
        write_gz(root / "split" / "sales" / f"{k}.csv.gz",
                 np.array(idx)[:, None], "%d")

    d1 = convert_ogb_raw(str(root))
    assert (root / "processed.npz").exists()
    d2 = load_ogb_node(str(root))  # npz fast path
    np.testing.assert_array_equal(d1.edge_index, d2.edge_index)
    np.testing.assert_allclose(d1.x, d2.x, rtol=1e-5)
    np.testing.assert_array_equal(d1.y, [0, 1, 1, 0])
    assert d2.edge_index.shape[1] == 8  # symmetrized
    assert d2.train_mask.sum() == 2 and d2.test_mask[3]


def test_load_amazon_npz(tmp_path):
    """Fabricate the Shchur-format Amazon npz and parse it."""
    import scipy.sparse as sp

    from sgracex1_tpu.graph.datasets import load_amazon

    rng = np.random.default_rng(0)
    adj = sp.random(10, 10, density=0.3, format="csr", random_state=1)
    attr = sp.random(10, 7, density=0.5, format="csr", random_state=2)
    y = rng.integers(0, 3, 10)
    np.savez(
        tmp_path / "amazon_electronics_photo.npz",
        adj_data=adj.data, adj_indices=adj.indices,
        adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
        attr_data=attr.data, attr_indices=attr.indices,
        attr_indptr=attr.indptr, attr_shape=np.array(attr.shape),
        labels=y,
    )
    d = load_amazon(str(tmp_path / "amazon_electronics_photo.npz"))
    assert d.x.shape == (10, 7)
    np.testing.assert_array_equal(d.y, y)
    es = set(map(tuple, d.edge_index.T))
    assert all((b, a) in es for a, b in es)  # symmetrized
    assert (d.train_mask | d.val_mask | d.test_mask).all()
