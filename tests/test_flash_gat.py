"""Flash GAT kernel: parity with the edge-path reference, gradients via the
reference softmax-Jacobian identity, and GATConv integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.bsr import bsr_from_sparse
from sgracex1_tpu.ops.flash_gat import (
    flash_gat_forward,
    gat_attention_agg,
    gat_attention_agg_ref,
)


def _graph(rng, n=300, density=0.03, tb=128):
    mat = sp.random(n, n, density=density, format="csr",
                    random_state=7).astype(np.float32)
    mat.setdiag(0.9)  # self loops participate (vals > 0)
    A = SparseMatrix.from_scipy(mat)
    B = bsr_from_sparse(A, tb=tb, dtype=jnp.float32)
    return A, B


@pytest.mark.parametrize("F", [16, 64])
def test_flash_forward_matches_edge_reference(rng, F):
    A, B = _graph(rng)
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(
        rng.standard_normal((A.n_cols, F)).astype(np.float32)
    )
    out = np.asarray(flash_gat_forward(B, s1, s2, Wh))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)  # bf16 matmul


def test_flash_handles_isolated_rows(rng):
    # rows with no edges at all must produce zeros, like the edge path
    rows = np.array([0, 0, 2])
    cols = np.array([0, 1, 2])
    vals = np.array([1.0, 0.5, 1.0], np.float32)
    A = SparseMatrix.from_coo(rows, cols, vals, (4, 4))
    B = bsr_from_sparse(A, tb=128, dtype=jnp.float32)
    s1 = jnp.arange(4, dtype=jnp.float32)
    s2 = jnp.arange(4, dtype=jnp.float32) * 0.3
    Wh = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    out = np.asarray(flash_gat_forward(B, s1, s2, Wh))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[3], 0.0, atol=1e-6)


def test_flash_multi_rowblock(rng):
    # graphs spanning several row/col tiles exercise the online rescaling
    A, B = _graph(rng, n=520, density=0.02, tb=128)
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32) * 3)
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32) * 3)
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, 32)).astype(np.float32))
    out = np.asarray(flash_gat_forward(B, s1, s2, Wh))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_gat_agg_gradients_match_reference(rng):
    A, B = _graph(rng, n=260)
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((A.n_rows, 16)).astype(np.float32))

    def loss_flash(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg(A, B, s1, s2, Wh), v)

    def loss_ref(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_ref(A, s1, s2, Wh), v)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(s1, s2, Wh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s1, s2, Wh)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("n,F", [(260, 16), (520, 32)])
def test_fused_backward_matches_reference(rng, n, F):
    """The fully fused (tile-kernel) backward reproduces the edge-path
    gradients for s1, s2 and Wh — including multi-tile rows/cols."""
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_fused

    A, B = _graph(rng, n=n, density=0.02)
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, F)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((A.n_rows, F)).astype(np.float32))

    def loss_fused(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_fused(B, s1, s2, Wh), v)

    def loss_ref(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_ref(A, s1, s2, Wh), v)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(s1, s2, Wh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s1, s2, Wh)
    for a, b in zip(gf, gr):
        # bf16 MXU matmuls in both q and dWh: fp16-level tolerance
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
        )


def test_fused_backward_int8_mask_tiles(rng):
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_fused

    A, _ = _graph(rng, n=260, density=0.02)
    B8 = bsr_mask_from_sparse(A, tb=128)
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((A.n_rows, 16)).astype(np.float32))

    def loss(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_fused(B8, s1, s2, Wh), v)

    def loss_ref(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_ref(A, s1, s2, Wh), v)

    gf = jax.grad(loss, argnums=(0, 1, 2))(s1, s2, Wh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s1, s2, Wh)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
        )


def test_flash_bitpacked_mask_tiles(rng):
    """1-bit packed mask tiles (32x less HBM than f32) reproduce the edge
    path, forward and fused backward."""
    from sgracex1_tpu.ops.bsr import bsr_bitmask_from_sparse
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_fused

    A, _ = _graph(rng, n=1500, density=0.005)
    B1 = bsr_bitmask_from_sparse(A, tb=1024)
    assert B1.tiles.dtype == jnp.uint8
    assert B1.tiles.shape[-1] == 128
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((A.n_rows, 16)).astype(np.float32))

    out = np.asarray(flash_gat_forward(B1, s1, s2, Wh))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def loss(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_fused(B1, s1, s2, Wh), v)

    def loss_ref(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_ref(A, s1, s2, Wh), v)

    gf = jax.grad(loss, argnums=(0, 1, 2))(s1, s2, Wh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s1, s2, Wh)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
        )


@pytest.mark.parametrize("H", [2, 4])
def test_multihead_batched_matches_per_head(rng, H):
    """The head-batched kernel (grid = (H, tiles), ONE compiled kernel for
    all heads) reproduces H independent single-head calls — forward and
    fused backward."""
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_fused

    A, B = _graph(rng, n=300, density=0.03)
    F = 16
    S1 = jnp.asarray(rng.standard_normal((A.n_rows, H)).astype(np.float32))
    S2 = jnp.asarray(rng.standard_normal((A.n_cols, H)).astype(np.float32))
    Wh = jnp.asarray(
        rng.standard_normal((A.n_cols, H, F)).astype(np.float32)
    )
    v = jnp.asarray(
        rng.standard_normal((A.n_rows, H, F)).astype(np.float32)
    )

    out_mh = np.asarray(flash_gat_forward(B, S1, S2, Wh))
    for h in range(H):
        ref_h = np.asarray(
            flash_gat_forward(B, S1[:, h], S2[:, h], Wh[:, h])
        )
        np.testing.assert_allclose(
            out_mh[:, h], ref_h, rtol=1e-5, atol=1e-5,
            err_msg=f"multi-head fwd mismatch, head {h}",
        )

    def loss_mh(S1, S2, Wh):
        return jnp.vdot(gat_attention_agg_fused(B, S1, S2, Wh), v)

    g_mh = jax.grad(loss_mh, argnums=(0, 1, 2))(S1, S2, Wh)

    def loss_h(h):
        def f(s1, s2, wh):
            return jnp.vdot(
                gat_attention_agg_fused(B, s1, s2, wh), v[:, h]
            )
        return f

    for h in range(H):
        g_h = jax.grad(loss_h(h), argnums=(0, 1, 2))(
            S1[:, h], S2[:, h], Wh[:, h]
        )
        for gm, gs, name in zip(
            (g_mh[0][:, h], g_mh[1][:, h], g_mh[2][:, h]),
            g_h,
            ("ds1", "ds2", "dWh"),
        ):
            np.testing.assert_allclose(
                np.asarray(gm), np.asarray(gs), rtol=1e-4, atol=1e-5,
                err_msg=f"multi-head bwd mismatch head {h} {name}",
            )


def test_gatconv_flash_backend_matches_edge_backend(rng):
    """GATConv produces the same output whether aggregation runs on the
    flash kernel (bsr-prepared adjacency) or the XLA edge path."""
    from sgracex1_tpu.graph.datasets import sbm_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.nn.layers import GATConv
    from sgracex1_tpu.ops.dispatch import prepare_adjacency

    data = sbm_node_classification(n=220, seed=5)
    A = sym_norm(data.edge_index, data.num_nodes, fill=1.0)
    x = jnp.asarray(data.x)
    conv = GATConv(data.num_features, 16, nheads=2)
    params = conv.init(jax.random.PRNGKey(0), A, x)
    ref = conv.apply(params, A, x)

    prep = prepare_adjacency(A, method="bsr", tb=128)
    out = conv.apply(params, prep, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_flash_int8_mask_tiles(rng):
    """int8 {0,1} mask tiles (1/4 the HBM traffic) give the same output."""
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse

    A, B = _graph(rng, n=300)
    B8 = bsr_mask_from_sparse(A, tb=128)
    assert B8.tiles.dtype == jnp.int8
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, 16)).astype(np.float32))
    out8 = np.asarray(flash_gat_forward(B8, s1, s2, Wh))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    np.testing.assert_allclose(out8, ref, rtol=2e-2, atol=2e-2)


def test_halo_agg_vjp_matches_autodiff(rng):
    """flash_gat_halo_agg's hand-written merged-stats VJP matches jnp
    autodiff of the same shard-local composition (local tiles + remote
    edges, one row softmax over both)."""
    from sgracex1_tpu.ops.flash_gat import flash_gat_halo_agg

    n, HL, F, alpha = 96, 24, 8, 0.2
    A, B = _graph(rng, n=n, density=0.05, tb=16)
    # remote edges: random (row, halo-slot) pairs, some masked out
    E_r = 80
    rows_rem = jnp.asarray(rng.integers(0, n, E_r).astype(np.int32))
    cols_halo = jnp.asarray(rng.integers(0, HL, E_r).astype(np.int32))
    mask_rem = jnp.asarray(rng.random(E_r) < 0.8)

    s1 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.5)
    s2 = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.5)
    s2h = jnp.asarray(rng.standard_normal(HL).astype(np.float32) * 0.5)
    Wh = jnp.asarray(rng.standard_normal((n, F)).astype(np.float32))
    halo = jnp.asarray(rng.standard_normal((HL, F)).astype(np.float32))

    def ref(s1v, s2v, s2hv, Whv, halov):
        # dense local scores masked by the adjacency + remote edge scores,
        # one softmax over the union
        Ad = jnp.asarray(A.to_dense())
        e_loc = s1v[:, None] + s2v[None, :]
        e_loc = jnp.where(e_loc > 0, e_loc, alpha * e_loc)
        e_loc = jnp.where(Ad > 0, e_loc, -9e15)
        e_rem_full = jnp.full((n, E_r), -9e15)
        e_r = jnp.take(s1v, rows_rem) + jnp.take(s2hv, cols_halo)
        e_r = jnp.where(e_r > 0, e_r, alpha * e_r)
        e_r = jnp.where(mask_rem, e_r, -9e15)
        e_rem_full = e_rem_full.at[rows_rem, jnp.arange(E_r)].set(e_r)
        e_all = jnp.concatenate([e_loc, e_rem_full], axis=1)
        p = jax.nn.softmax(e_all, axis=1)
        feats = jnp.concatenate([Whv, jnp.take(halov, cols_halo, axis=0)])
        out = p @ feats
        # rows with no edges at all: softmax of all -inf is uniform garbage;
        # zero them like the kernel does
        has_edge = jnp.max(e_all, axis=1) > -8e15
        return jnp.where(has_edge[:, None], out, 0.0)

    def fused(s1v, s2v, s2hv, Whv, halov):
        return flash_gat_halo_agg(
            B, s1v, s2v, s2hv, Whv, halov, rows_rem, cols_halo, mask_rem,
            alpha,
        )

    args = (s1, s2, s2h, Wh, halo)
    out_f = np.asarray(fused(*args))
    out_r = np.asarray(ref(*args))
    np.testing.assert_allclose(out_f, out_r, rtol=2e-2, atol=2e-2)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) ** 2)

    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(gf, gr, ("s1", "s2", "s2h", "Wh", "halo")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2,
            err_msg=f"halo-agg grad mismatch for {name}",
        )


def _hybrid_pieces(rng, n=420, density=0.02, tb=64, thresh=95, K=128):
    """Random graph split by tile density into (chunked flash plan, rest)
    exactly as prepare_adjacency(for_gat=True) does at scale."""
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse, bsr_tile_keys
    from sgracex1_tpu.ops.dispatch import split_by_tile_density
    from sgracex1_tpu.ops.fused_agg import build_fused_plan

    mat = sp.random(n, n, density=density, format="csr",
                    random_state=11).astype(np.float32)
    mat.setdiag(0.9)
    A = SparseMatrix.from_scipy(mat)
    part, rest = split_by_tile_density(A, tb, thresh)
    assert part.nnz and rest.nnz, "split degenerate — adjust test params"
    B = bsr_mask_from_sparse(part, tb=tb, cover_rows=True, cover_cols=True)
    plan = build_fused_plan(
        B, rest, K=K,
        tile_keys=bsr_tile_keys(part, tb, cover_rows=True,
                                cover_cols=True),
    )
    return A, plan, rest


def test_hybrid_agg_matches_reference(rng):
    """Single-chip hybrid attention (dense tiles + edge remainder merged
    via the block-combine identity) reproduces the edge-path reference —
    forward and gradients, with cotangent fan-in to s2/Wh summed across
    the two populations."""
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_hybrid

    A, plan, rest = _hybrid_pieces(rng)
    F = 16
    s1 = jnp.asarray(rng.standard_normal(A.n_rows).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(A.n_cols).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((A.n_cols, F)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((A.n_rows, F)).astype(np.float32))

    out = np.asarray(gat_attention_agg_hybrid(plan, rest, s1, s2, Wh))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def loss_h(s1, s2, Wh):
        return jnp.vdot(
            gat_attention_agg_hybrid(plan, rest, s1, s2, Wh), v
        )

    def loss_ref(s1, s2, Wh):
        return jnp.vdot(gat_attention_agg_ref(A, s1, s2, Wh), v)

    gh = jax.grad(loss_h, argnums=(0, 1, 2))(s1, s2, Wh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s1, s2, Wh)
    for a, b, name in zip(gh, gr, ("ds1", "ds2", "dWh")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2,
            err_msg=f"hybrid grad mismatch for {name}",
        )


def test_hybrid_agg_multihead(rng):
    """Hybrid attention with batched heads matches per-head hybrid calls
    and the edge reference."""
    from sgracex1_tpu.ops.flash_gat import gat_attention_agg_hybrid

    A, plan, rest = _hybrid_pieces(rng, n=300, density=0.03, thresh=130)
    H, F = 2, 8
    S1 = jnp.asarray(rng.standard_normal((A.n_rows, H)).astype(np.float32))
    S2 = jnp.asarray(rng.standard_normal((A.n_cols, H)).astype(np.float32))
    Wh = jnp.asarray(
        rng.standard_normal((A.n_cols, H, F)).astype(np.float32)
    )
    out = np.asarray(gat_attention_agg_hybrid(plan, rest, S1, S2, Wh))
    for h in range(H):
        ref_h = np.asarray(
            gat_attention_agg_ref(A, S1[:, h], S2[:, h], Wh[:, h])
        )
        np.testing.assert_allclose(
            out[:, h], ref_h, rtol=2e-2, atol=2e-2,
            err_msg=f"hybrid multi-head mismatch, head {h}",
        )


def test_prepare_attaches_hybrid_flash_split(rng, monkeypatch):
    """prepare_adjacency(for_gat=True) attaches (gat_bsr, gat_rest) when
    the chooser picks the hybrid attention split, and GATConv's output on
    that prep matches the edge path."""
    from sgracex1_tpu.graph.datasets import sbm_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.nn.layers import GATConv
    from sgracex1_tpu.ops import dispatch as dm

    data = sbm_node_classification(n=260, seed=9)
    A = sym_norm(data.edge_index, data.num_nodes, fill=1.0)
    x = jnp.asarray(data.x)
    # force the hybrid regime on this small graph (the real chooser only
    # picks it at power-law scale)
    monkeypatch.setattr(
        dm, "_choose_flash_plan",
        lambda A, n, hybrid=True, train=True: (64, False, 3),
    )
    prep = dm.prepare_adjacency(A, method="xla", for_gat=True)
    assert prep.gat_bsr is not None and prep.gat_rest is not None
    assert prep.gat_plan is not None and prep.gat_plan.B is prep.gat_bsr
    assert prep.gat_bsr.tb == 64
    # the two populations partition the edge set exactly
    n_tile_edges = int(jnp.sum(prep.gat_bsr.tiles > 0))
    assert n_tile_edges + prep.gat_rest.nnz == A.nnz

    conv = GATConv(data.num_features, 16, nheads=2)
    params = conv.init(jax.random.PRNGKey(0), A, x)
    ref = conv.apply(params, A, x)
    out = conv.apply(params, prep, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )

    # training gradients flow through the hybrid path
    def loss(p):
        return jnp.sum(conv.apply(p, prep, x) ** 2)

    def loss_ref(p):
        return jnp.sum(conv.apply(p, A, x) ** 2)

    g = jax.grad(loss)(params)
    gr = jax.grad(loss_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2
        ),
        g, gr,
    )


def test_flash_fast_exp_close_to_exact(rng):
    """fast_exp (Schraudolph, ~3% max rel err on probabilities) stays close
    to the exact flash forward and the edge reference."""
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.ops.flash_gat import (
        flash_gat_forward, gat_attention_agg_ref,
    )
    from tests.conftest import make_random_graph
    from sgracex1_tpu.graph.normalize import sym_norm

    n = 700
    A = sym_norm(make_random_graph(rng, n, avg_degree=5), n)
    B = bsr_mask_from_sparse(A, tb=128)
    s1 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    Wh = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    ref = np.asarray(gat_attention_agg_ref(A, s1, s2, Wh))
    fast = np.asarray(flash_gat_forward(B, s1, s2, Wh, fast_exp=True))[:n]
    # attention probabilities renormalize, so output error stays ~3%
    np.testing.assert_allclose(fast, ref, rtol=8e-2, atol=8e-2)
    exact = np.asarray(flash_gat_forward(B, s1, s2, Wh))[:n]
    np.testing.assert_allclose(exact, ref, rtol=3e-2, atol=3e-2)  # bf16 MXU


def test_fast_exp_approximation_bounds():
    """The Schraudolph constants: <=3% relative error on [-30, 0], exact
    0.0 for deep-negative arguments (masked positions)."""
    from sgracex1_tpu.ops.flash_gat import _fast_exp

    x = jnp.linspace(-30.0, 0.0, 20001)
    rel = np.abs(np.asarray(_fast_exp(x)) / np.exp(np.asarray(x)) - 1.0)
    assert rel.max() < 0.031, rel.max()
    deep = np.asarray(_fast_exp(jnp.asarray([-1e5, -1e9, -200.0])))
    np.testing.assert_array_equal(deep, 0.0)


def test_flash_forward_sliced_parity(rng, monkeypatch):
    """Tile schedules past _MAX_TILES_PER_CALL split into multiple pallas
    calls at row-block boundaries (SMEM cap at the 100k-tile scale);
    forward and stats outputs must match the single-call kernel."""
    import sgracex1_tpu.ops.bsr as bsrmod
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.ops.flash_gat import flash_gat_forward

    n = 1024
    m = n * 6
    ei = np.unique(
        np.stack([rng.integers(0, n, m), rng.integers(0, n, m)]), axis=1
    )
    A = sym_norm(ei, n, fill=1.0)
    B1 = bsr_mask_from_sparse(A, tb=128)
    assert len(B1.slices) == 1
    monkeypatch.setattr(bsrmod, "_MAX_TILES_PER_CALL", 7)
    B2 = bsr_mask_from_sparse(A, tb=128)
    assert len(B2.slices) > 1
    Wh = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    s1 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    o1, m1, l1 = flash_gat_forward(B1, s1, s2, Wh, return_stats=True)
    o2, m2, l2 = flash_gat_forward(B2, s1, s2, Wh, return_stats=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-6,
                               atol=1e-6)


def test_flash_backward_sliced_parity(rng, monkeypatch):
    """Both backward passes split like the forward (row slices + column
    slices over the col-sorted order); gradients must match."""
    import sgracex1_tpu.ops.bsr as bsrmod
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.ops.flash_gat import (
        flash_gat_backward,
        flash_gat_forward,
    )

    n = 768
    m = n * 6
    ei = np.unique(
        np.stack([rng.integers(0, n, m), rng.integers(0, n, m)]), axis=1
    )
    A = sym_norm(ei, n, fill=1.0)
    B1 = bsr_mask_from_sparse(A, tb=128)
    monkeypatch.setattr(bsrmod, "_MAX_TILES_PER_CALL", 5)
    B2 = bsr_mask_from_sparse(A, tb=128)
    assert len(B2.slices) > 1 and len(B2.slices_col) > 1
    F = 16
    Wh = rng.standard_normal((n, F)).astype(np.float32)
    s1 = rng.standard_normal(n).astype(np.float32)
    s2 = rng.standard_normal(n).astype(np.float32)
    g_out = rng.standard_normal((n, F)).astype(np.float32)
    outs = []
    for B in (B1, B2):
        _, mm, ll = flash_gat_forward(
            B, jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(Wh),
            return_stats=True,
        )
        outs.append(flash_gat_backward(
            B, jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(Wh),
            jnp.asarray(g_out), mm, ll,
        ))
    for a, b, name in zip(outs[0], outs[1], ("ds1", "ds2", "dWh")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5,
            err_msg=name,
        )
