"""Multi-device tests on the simulated 8-device CPU mesh (SURVEY.md §4.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.parallel.mesh import make_mesh
from sgracex1_tpu.parallel.partition import partition_graph, pad_nodes
from sgracex1_tpu.parallel.spmm_dist import dist_spmm, dist_gnn_layer, dist_gat_layer
from sgracex1_tpu.ops.fused_gnn import gnn_layer, gat_layer


def _graph(rng, n=100):
    mat = sp.random(n, n, density=0.08, format="csr", random_state=17)
    mat.setdiag(0.5)
    return SparseMatrix.from_scipy(mat), mat


@pytest.fixture(params=[2, 4, 8])
def mesh(request):
    if len(jax.devices()) < request.param:
        pytest.skip("not enough devices")
    return make_mesh(request.param)


def test_partition_covers_all_edges(rng):
    A, mat = _graph(rng)
    G, n_pad = partition_graph(A, 4)
    assert G.vals.shape[0] == 4
    # every real edge appears exactly once
    total = sum(
        int((G.vals[s] != 0).sum()) for s in range(4)
    )
    assert total == (mat.toarray() != 0).sum()


def test_dist_spmm_matches_single(rng, mesh):
    S = mesh.devices.size
    A, mat = _graph(rng)
    G, n_pad = partition_graph(A, S)
    H = rng.standard_normal((A.n_rows, 16)).astype(np.float32)
    Hp = pad_nodes(H, n_pad)
    out = np.asarray(dist_spmm(mesh, G, jnp.asarray(Hp)))[: A.n_rows]
    np.testing.assert_allclose(out, mat @ H, rtol=1e-5, atol=1e-5)


def test_dist_gnn_layer_matches_single(rng, mesh):
    S = mesh.devices.size
    A, mat = _graph(rng)
    G, n_pad = partition_graph(A, S)
    x = rng.standard_normal((A.n_rows, 12)).astype(np.float32)
    W = rng.standard_normal((12, 8)).astype(np.float32)
    out = np.asarray(
        dist_gnn_layer(mesh, G, jnp.asarray(pad_nodes(x, n_pad)), jnp.asarray(W), relu=True)
    )[: A.n_rows]
    expect = np.asarray(gnn_layer(A, x, W, relu=True))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_dist_gat_layer_matches_single(rng, mesh):
    S = mesh.devices.size
    A, mat = _graph(rng)
    G, n_pad = partition_graph(A, S)
    x = rng.standard_normal((A.n_rows, 12)).astype(np.float32)
    W = rng.standard_normal((12, 8)).astype(np.float32)
    att = rng.standard_normal((16, 1)).astype(np.float32)
    out = np.asarray(
        dist_gat_layer(
            mesh, G, jnp.asarray(pad_nodes(x, n_pad)), jnp.asarray(W), jnp.asarray(att), relu=True
        )
    )[: A.n_rows]
    expect = np.asarray(gat_layer(A, x, W, jnp.asarray(att), relu=True))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=2e-4)


def test_dist_layer_gradients_match_single(rng, mesh):
    """grad through shard_map (all_gather -> reduce_scatter transpose)
    equals the single-device gradient."""
    S = mesh.devices.size
    A, mat = _graph(rng, n=64)
    G, n_pad = partition_graph(A, S)
    x = rng.standard_normal((A.n_rows, 6)).astype(np.float32)
    W = rng.standard_normal((6, 4)).astype(np.float32)
    xp = jnp.asarray(pad_nodes(x, n_pad))

    def loss_dist(w):
        out = dist_gnn_layer(mesh, G, xp, w, relu=True)
        return jnp.sum(out[: A.n_rows] ** 2)

    def loss_single(w):
        return jnp.sum(gnn_layer(A, x, w, relu=True) ** 2)

    g_dist = np.asarray(jax.grad(loss_dist)(jnp.asarray(W)))
    g_single = np.asarray(jax.grad(loss_single)(jnp.asarray(W)))
    np.testing.assert_allclose(g_dist, g_single, rtol=1e-4, atol=1e-4)


def test_full_training_step_under_mesh(rng):
    """One jitted train step (2-layer GCN + head) over an 8-device mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(8)
    A, _ = _graph(rng, n=96)
    G, n_pad = partition_graph(A, 8)
    x = jnp.asarray(
        pad_nodes(rng.standard_normal((96, 12)).astype(np.float32), n_pad)
    )
    y = jnp.asarray(pad_nodes(rng.integers(0, 3, 96).astype(np.int32), n_pad))
    m = jnp.asarray(pad_nodes(np.ones(96, np.float32), n_pad))
    params = {
        "W1": jnp.asarray(rng.standard_normal((12, 16)).astype(np.float32) * 0.1),
        "W2": jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32) * 0.1),
        "Wo": jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32) * 0.1),
    }

    @jax.jit
    def step(params):
        def loss_fn(p):
            h = dist_gnn_layer(mesh, G, x, p["W1"], relu=True)
            h = dist_gnn_layer(mesh, G, h, p["W2"], relu=False)
            logits = h @ p["Wo"]
            ls = -jax.nn.log_softmax(logits)[jnp.arange(n_pad), y]
            return jnp.sum(ls * m) / jnp.sum(m)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, jax.tree.map(lambda a, g: a - 0.01 * g, params, grads)

    loss, new_params = step(params)
    assert np.isfinite(float(loss))
    loss2, _ = step(new_params)
    assert float(loss2) < float(loss)
