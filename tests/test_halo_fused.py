"""Distributed fused local-block aggregation (parallel/halo_fused):
parity with single-chip and gradients, rank-1 mask mode and value mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.graph.normalize import rank1_factor, sym_norm
from sgracex1_tpu.ops.spmm import spmm
from sgracex1_tpu.parallel.halo import build_halo
from sgracex1_tpu.parallel.halo_fused import (
    build_halo_fused,
    dist_gnn_layer_halo_fused,
    dist_spmm_halo_fused,
)
from sgracex1_tpu.parallel.mesh import make_mesh
from sgracex1_tpu.parallel.partition import pad_nodes
from tests.conftest import make_random_graph

from jax.sharding import NamedSharding, PartitionSpec as P


def _setup(rng, n, n_dev, f=12, tb=64, weighted=False):
    ei = make_random_graph(rng, n, avg_degree=6)
    if weighted:
        w = rng.uniform(0.5, 2.0, ei.shape[1]).astype(np.float32)
        A = SparseMatrix.from_coo(ei[0], ei[1], w, (n, n))
        fac = None
    else:
        A = sym_norm(ei, n, fill=1.0)
        fac = rank1_factor(A)
        assert fac is not None
    G, n_pad = build_halo(A, n_dev)
    FP = build_halo_fused(G, tb=tb, rank1_factors=fac)
    mesh = make_mesh(n_dev)
    sh = NamedSharding(mesh, P("graph"))
    H = rng.standard_normal((n, f)).astype(np.float32)
    H_d = jax.device_put(pad_nodes(H, n_pad), sh)
    G_d = jax.device_put(G, sh)
    # FP stays uncommitted: jax.grad outside jit rejects committed inputs
    # whose XLA-derived cotangent sharding disagrees (the BSR plan tests
    # do the same); under jit, device_put(FP, sh) also works.
    return A, G_d, FP, mesh, H, H_d, n_pad


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_halo_fused_spmm_matches_single(rng, n_dev):
    n = 96 * 4
    A, G, FP, mesh, H, H_d, n_pad = _setup(rng, n, n_dev)
    out = np.asarray(jax.jit(
        lambda h: dist_spmm_halo_fused(mesh, G, FP, h)
    )(H_d))[:n]
    expect = np.asarray(spmm(A, jnp.asarray(H)))
    np.testing.assert_allclose(out, expect, rtol=5e-2, atol=5e-2)


def test_halo_fused_value_mode_matches_single(rng):
    """Weighted graph -> bf16 value tiles + value slots, no scalings."""
    n, n_dev = 96 * 4, 4
    A, G, FP, mesh, H, H_d, n_pad = _setup(rng, n, n_dev, weighted=True)
    assert FP.colscale is None
    out = np.asarray(jax.jit(
        lambda h: dist_spmm_halo_fused(mesh, G, FP, h)
    )(H_d))[:n]
    expect = np.asarray(spmm(A, jnp.asarray(H)))
    np.testing.assert_allclose(out, expect, rtol=5e-2, atol=5e-2)


def test_halo_fused_gradients_match(rng):
    n, n_dev, f, h = 96 * 2, 4, 8, 6
    A, G, FP, mesh, X, X_d, n_pad = _setup(rng, n, n_dev, f=f)
    W = jnp.asarray(rng.standard_normal((f, h)).astype(np.float32) * 0.3)

    def loss_dist(xv, Wv):
        return jnp.sum(
            dist_gnn_layer_halo_fused(mesh, G, FP, xv, Wv, relu=True) ** 2
        )

    def loss_single(xv, Wv):
        Hh = jnp.dot(xv, Wv)
        out = spmm(A, Hh)
        return jnp.sum(jnp.maximum(out, 0.0) ** 2)

    # jit the grad: eager shard_map transpose trips an XLA sharding-
    # override assertion on the plan pytree (training code always jits)
    gd = jax.jit(jax.grad(loss_dist, argnums=(0, 1)))(X_d, W)
    gs = jax.grad(loss_single, argnums=(0, 1))(jnp.asarray(X), W)
    np.testing.assert_allclose(
        np.asarray(gd[0])[:n], np.asarray(gs[0]), rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(gd[1]), np.asarray(gs[1]), rtol=5e-2, atol=5e-2
    )


def test_halo_fused_packed_tiles_at_1024(rng):
    """tb=1024 -> 1-bit packed local tiles survive the stacking."""
    n, n_dev = 4096, 2
    A, G, FP, mesh, H, H_d, n_pad = _setup(rng, n, n_dev, tb=1024)
    assert FP.tiles.dtype == jnp.uint8
    assert FP.tiles.shape[-1] == 1024 // 8
    out = np.asarray(jax.jit(
        lambda hv: dist_spmm_halo_fused(mesh, G, FP, hv)
    )(H_d))[:n]
    expect = np.asarray(spmm(A, jnp.asarray(H)))
    np.testing.assert_allclose(out, expect, rtol=5e-2, atol=5e-2)


def test_halo_fused_mixed_rank1_detection_degrades_uniformly(rng):
    """r4 advisor (medium): with per-shard rank-1 detection, one
    non-factoring shard next to factoring ones must NOT stack mask tiles
    beside value tiles — all shards degrade to value mode and the result
    stays exact."""
    n, n_dev = 96 * 2, 2
    half = n // 2
    # shard 0's local block: random weights (defeats rank1_factor);
    # shard 1's local block: constant-value edges (factors as rank 1)
    m = 400
    r0 = rng.integers(0, half, m)
    c0 = rng.integers(0, half, m)
    v0 = rng.uniform(0.5, 2.0, m).astype(np.float32)
    r1 = rng.integers(half, n, m)
    c1 = rng.integers(half, n, m)
    k0 = np.unique(r0.astype(np.int64) * n + c0)
    k1 = np.unique(r1.astype(np.int64) * n + c1)
    rows = np.concatenate([k0 // n, k1 // n])
    cols = np.concatenate([k0 % n, k1 % n])
    vals = np.concatenate(
        [v0[: len(k0)], np.full(len(k1), 0.7, np.float32)]
    )
    A = SparseMatrix.from_coo(rows, cols, vals, (n, n))
    G, n_pad = build_halo(A, n_dev)
    FP = build_halo_fused(G, tb=64)  # per-shard detection path
    assert FP.colscale is None  # uniform VALUE mode, not mixed
    mesh = make_mesh(n_dev)
    sh = NamedSharding(mesh, P("graph"))
    H = rng.standard_normal((n, 12)).astype(np.float32)
    H_d = jax.device_put(pad_nodes(H, n_pad), sh)
    G_d = jax.device_put(G, sh)
    out = np.asarray(jax.jit(
        lambda h: dist_spmm_halo_fused(mesh, G_d, FP, h)
    )(H_d))[:n]
    expect = np.asarray(spmm(A, jnp.asarray(H)))
    np.testing.assert_allclose(out, expect, rtol=5e-2, atol=5e-2)


def test_halo_fused_auto_tb_and_k(rng):
    """tb='auto' (cost-model per-shard tile size) and K=None (per-plan
    chunk width, stacker-unified) build a working plan."""
    n, n_dev = 96 * 4, 4
    A, G, FP, mesh, H, H_d, n_pad = _setup(rng, n, n_dev)
    ei = make_random_graph(rng, n, avg_degree=6)
    A2 = sym_norm(ei, n, fill=1.0)
    fac = rank1_factor(A2)
    G2, n_pad2 = build_halo(A2, n_dev)
    FP2 = build_halo_fused(G2, rank1_factors=fac)  # tb auto, K auto
    assert FP2.tb in (256, 512, 1024)
    sh = NamedSharding(make_mesh(n_dev), P("graph"))
    H2 = rng.standard_normal((n, 12)).astype(np.float32)
    H2_d = jax.device_put(pad_nodes(H2, n_pad2), sh)
    G2_d = jax.device_put(G2, sh)
    out = np.asarray(jax.jit(
        lambda h: dist_spmm_halo_fused(make_mesh(n_dev), G2_d, FP2, h)
    )(H2_d))[:n]
    expect = np.asarray(spmm(A2, jnp.asarray(H2)))
    np.testing.assert_allclose(out, expect, rtol=5e-2, atol=5e-2)
