"""Fused tile+remainder+scaling aggregation kernel (ops/fused_agg).

Covers what the dispatch-level parity tests don't reach directly: the
multi-chunk remainder schedule under heavy per-block skew, the value-tile
(non-rank-1) slot mode, and schedule invariants."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.dispatch import agg_matmul, prepare_adjacency


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _weighted_graph(rng, n=2048, avg_degree=12):
    """Random WEIGHTED graph (values defeat rank1_factor -> value tiles)."""
    m = n * avg_degree
    r = rng.integers(0, n, m)
    c = rng.integers(0, n, m)
    k = np.unique(r * n + c)
    r, c = k // n, k % n
    v = rng.uniform(0.5, 2.0, len(r)).astype(np.float32)
    A = SparseMatrix.from_coo(r, c, v, (n, n))
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    return A, mat


def _skewed_rank1_graph(rng, n=8192, tb=128):
    """Sym-normalized graph with one row block owning hundreds of rest
    edges (multiple one-hot chunks) plus dense diagonal tiles."""
    from sgracex1_tpu.graph.normalize import sym_norm

    rows = [np.arange(n), np.arange(n - 1)]
    cols = [np.arange(n), np.arange(1, n)]
    # heavy scatter inside row block 3: ~600 edges to random columns
    hub_r = rng.integers(3 * tb, 4 * tb, 600)
    hub_c = rng.integers(0, n, 600)
    rows.append(hub_r)
    cols.append(hub_c)
    ei = np.stack([np.concatenate(rows), np.concatenate(cols)])
    ei = np.unique(ei, axis=1)
    A = sym_norm(ei, n, fill=1.0)
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    v = np.asarray(A.vals[: A.nnz])
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    return A, mat


def test_value_tiles_with_rest_fused(rng):
    """Weighted graph -> value tiles + value-slot remainder, no scalings."""
    A, mat = _weighted_graph(rng)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    assert prep.kind == "hybrid" and prep.r1_row is None
    assert prep.fused is not None and prep.fused.colscale is None
    H = jnp.asarray(rng.standard_normal((A.n_cols, 64)).astype(np.float32))
    out = np.asarray(jax.jit(agg_matmul)(prep, H))
    np.testing.assert_allclose(out, mat @ np.asarray(H), rtol=5e-2, atol=5e-2)
    v = rng.standard_normal((A.n_rows, 64)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), v))(H)
    np.testing.assert_allclose(np.asarray(g), mat.T @ v, rtol=5e-2, atol=5e-2)


def test_multichunk_rest_fused(rng):
    """A row block with ~600 rest edges spans several one-hot chunks."""
    A, mat = _skewed_rank1_graph(rng)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    assert prep.kind == "hybrid" and prep.fused is not None
    assert prep.rest is not None and prep.rest.nnz > 300
    K = prep.fused.K
    # the skewed block must occupy more than one chunk
    assert prep.fused.num_chunks > prep.rest.nnz // K
    H = jnp.asarray(rng.standard_normal((A.n_cols, 64)).astype(np.float32))
    out = np.asarray(jax.jit(agg_matmul)(prep, H))
    np.testing.assert_allclose(out, mat @ np.asarray(H), rtol=5e-2, atol=5e-2)
    v = rng.standard_normal((A.n_rows, 64)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), v))(H)
    np.testing.assert_allclose(np.asarray(g), mat.T @ v, rtol=5e-2, atol=5e-2)


def test_fused_schedule_invariants(rng):
    """Step arrays: rb-sorted runs, chunks follow the first tile of their
    run with repeated tile/H indices (DMA revisit skip), sentinel tail."""
    A, mat = _skewed_rank1_graph(rng)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    f = prep.fused
    srb = np.asarray(f.step_rb)
    stile = np.asarray(f.step_tile)
    skind = np.asarray(f.step_kind)
    scb = np.asarray(f.step_cb)
    S = len(skind)
    assert srb[S] == f.B.n_row_tiles  # sentinel
    assert (np.diff(srb[:S]) >= 0).all()  # runs are rb-sorted
    rest_steps = np.nonzero(skind == 1)[0]
    assert len(rest_steps) == f.num_chunks
    for g in rest_steps:
        assert g > 0
        # chunk steps repeat the previous step's tile and H block
        assert stile[g] == stile[g - 1]
        assert scb[g] == scb[g - 1]
    # slot accounting: every real rest edge occupies exactly one slot
    lrow = np.asarray(f.lrow)[:, 0, :]
    assert (lrow < f.B.tb).sum() == prep.rest.nnz


def test_sliced_schedule_parity(rng, monkeypatch):
    """Schedules past _MAX_STEPS split into multiple pallas calls at
    row-block boundaries (SMEM cap for the scalar-prefetch arrays at the
    2^23 scale). Force a tiny cap and check forward + backward parity
    and the slice invariants."""
    from sgracex1_tpu.ops import fused_agg as fa

    monkeypatch.setattr(fa, "_MAX_STEPS", 6)
    A, mat = _skewed_rank1_graph(rng, n=4096, tb=128)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    f = prep.fused
    assert len(f.slices) > 1
    S = f.num_steps
    rb = np.asarray(f.step_rb)
    lo_prev = 0
    for (lo, hi, rb_lo, rb_hi) in f.slices:
        assert lo == lo_prev and hi > lo
        assert rb[lo] == rb_lo
        if hi < S:
            assert rb[hi] == rb_hi  # cut at a run boundary
            assert rb[hi] != rb[hi - 1]
        lo_prev = hi
    assert lo_prev == S
    H = jnp.asarray(rng.standard_normal((A.n_cols, 64)).astype(np.float32))
    out = np.asarray(jax.jit(agg_matmul)(prep, H))
    np.testing.assert_allclose(out, mat @ np.asarray(H), rtol=5e-2, atol=5e-2)
    v = rng.standard_normal((A.n_rows, 64)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), v))(H)
    np.testing.assert_allclose(np.asarray(g), mat.T @ v, rtol=5e-2, atol=5e-2)
