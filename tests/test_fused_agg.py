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
    """Step arrays under attach_chunks (the production default):
    rb-sorted runs, every tile processed exactly once (kind != 1),
    every true chunk processed exactly once (kind >= 1), overflow
    chunk-only steps repeat the previous tile/H block (DMA revisit
    skip), sentinel tail."""
    A, mat = _skewed_rank1_graph(rng)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    f = prep.fused
    srb = np.asarray(f.step_rb)
    stile = np.asarray(f.step_tile)
    skind = np.asarray(f.step_kind)
    scb = np.asarray(f.step_cb)
    schunk = np.asarray(f.step_chunk)
    S = len(skind)
    assert srb[S] == f.B.n_row_tiles  # sentinel
    assert (np.diff(srb[:S]) >= 0).all()  # runs are rb-sorted
    # tiles: each processed exactly once, in order
    tile_steps = skind != 1
    assert np.array_equal(
        np.sort(stile[tile_steps]), np.arange(f.B.num_tiles)
    )
    # chunks: each true chunk processed exactly once
    chunk_steps = skind >= 1
    assert np.array_equal(
        np.sort(schunk[chunk_steps]), np.arange(f.num_rest_chunks)
    )
    assert chunk_steps.sum() == f.num_rest_chunks
    # chunk-only overflow steps repeat the previous step's tile/H block
    for g in np.nonzero(skind == 1)[0]:
        assert g > 0
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


def test_pad_fused_plan_parity(rng):
    """A fused schedule padded to sticky (S, T, R, K) maxima produces the
    exact same aggregation — padding tiles are zero, padding chunk slots
    are dead, padding steps revisit the last run and add nothing."""
    from sgracex1_tpu.ops.fused_agg import bsr_spmm_fused, pad_fused_plan

    A, mat = _skewed_rank1_graph(rng, n=4096)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    plan = prep.fused
    assert plan is not None and plan.num_rest_chunks > 0
    H = jnp.asarray(rng.standard_normal((A.n_cols, 128)).astype(np.float32))
    base = np.asarray(bsr_spmm_fused(plan, H))

    S, T, R, K = (
        plan.num_steps, plan.B.num_tiles, plan.num_chunks, plan.K
    )
    padded = pad_fused_plan(plan, S=S + 7, T=T + 5, R=R + 2, K=K * 2)
    assert padded.num_steps == S + 7
    out = np.asarray(bsr_spmm_fused(padded, H))
    np.testing.assert_allclose(out, base, rtol=1e-6, atol=1e-6)

    # K-only and R-only paddings too
    out2 = np.asarray(
        bsr_spmm_fused(pad_fused_plan(plan, S=S, T=T, R=R + 1, K=K), H)
    )
    np.testing.assert_allclose(out2, base, rtol=1e-6, atol=1e-6)


def test_pad_prep_tiles_trace_stable(rng):
    """Two differently-shaped sampled preps run through the sticky pad
    converge to ONE traced shape (same treedef + leaf shapes) while
    keeping the fused schedules — the jitted sampled step compiles once
    (VERDICT r4 #4: the product path runs the flagship kernel)."""
    from sgracex1_tpu.train.loop import _pad_prep_tiles

    sticky: dict = {}
    preps, outs, Hs = [], [], []
    for seed, hub in ((0, 500), (1, 900)):
        r = np.random.default_rng(seed)
        A, mat = _skewed_rank1_graph(r, n=4096)
        # the sampler hands uniform-nnz, sticky-padded edge lists to
        # prepare (graph/sampling.py) — mirror that here
        A = A.pad_edges_to(16384).with_uniform_nnz()
        p = prepare_adjacency(A, method="hybrid", tb=128)
        assert p.fused is not None
        H = jnp.asarray(r.standard_normal((A.n_cols, 128)).astype(np.float32))
        pp = _pad_prep_tiles(p, sticky)
        preps.append(pp)
        Hs.append(H)
        outs.append(mat @ np.asarray(H))
    # second pass: re-pad the FIRST prep so both sit at the sticky maxima
    preps[0] = _pad_prep_tiles(preps[0], sticky)
    td0, td1 = (
        jax.tree_util.tree_structure((p, jnp.zeros(()))) for p in preps
    )
    assert td0 == td1
    shapes = [
        [np.shape(l) for l in jax.tree_util.tree_leaves(p)] for p in preps
    ]
    assert shapes[0] == shapes[1]
    # padded preps still compute the right answer (fused path engaged)
    for p, H, ref in zip(preps, Hs, outs):
        assert p.fused is not None and p.rest is None
        got = np.asarray(agg_matmul(p, H))
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("k", [2, 4])
def test_k_steps_schedule_parity(rng, k):
    """k-entries-per-grid-step execution (bsr_spmm_fused_k) matches the
    k=1 kernel exactly — runs pad to multiples of k with dead chunk
    steps at build time."""
    from sgracex1_tpu.ops.bsr import bsr_tile_keys
    from sgracex1_tpu.ops.dispatch import split_by_tile_density
    from sgracex1_tpu.ops.fused_agg import (
        bsr_spmm_fused, bsr_spmm_fused_k, build_fused_plan,
    )
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.graph.normalize import rank1_factor

    A, mat = _skewed_rank1_graph(rng, n=4096)
    fac = rank1_factor(A)
    assert fac is not None
    part, rest = split_by_tile_density(A, 128, 40)
    B = bsr_mask_from_sparse(part, tb=128, cover_rows=True,
                             cover_cols=True)
    keys = bsr_tile_keys(part, 128, cover_rows=True, cover_cols=True)
    base = build_fused_plan(B, rest, r1_row=fac[0], r1_col=fac[1],
                            K=128, tile_keys=keys)
    plank = build_fused_plan(B, rest, r1_row=fac[0], r1_col=fac[1],
                             K=128, tile_keys=keys, k_steps=k)
    assert plank.num_steps % k == 0
    H = jnp.asarray(rng.standard_normal((A.n_cols, 128)).astype(np.float32))
    o1 = np.asarray(bsr_spmm_fused(base, H))
    ok = np.asarray(bsr_spmm_fused_k(plank, H))
    np.testing.assert_allclose(ok, o1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(ok, mat @ np.asarray(H), rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("group", [2, 4])
def test_grouped_output_parity(rng, group, monkeypatch):
    """The grouped-output probe (group row blocks per output block,
    bsr_spmm_fused(group=...)) matches group=1 exactly — including on
    value-mode plans and sliced schedules. Kept as a measured NEGATIVE
    on hardware (DESIGN §1.2d: 8.28-9.14 ms vs 7.25 at 2^20 for group
    2-8 — the dynamic-index accumulator costs more than the saved
    output drains); the parity coverage stays so the probe remains
    runnable."""
    from sgracex1_tpu.ops import fused_agg as fa

    A, mat = _skewed_rank1_graph(rng, n=4096)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    H = jnp.asarray(rng.standard_normal((A.n_cols, 128)).astype(np.float32))
    o1 = np.asarray(fa.bsr_spmm_fused(prep.fused, H))
    og = np.asarray(fa.bsr_spmm_fused(prep.fused, H, group=group))
    np.testing.assert_array_equal(og, o1)
    # sliced schedule: group boundaries fall inside slices
    monkeypatch.setattr(fa, "_MAX_STEPS", 8)
    prep_s = prepare_adjacency(A, method="hybrid", tb=128)
    assert len(prep_s.fused.slices) > 1
    og_s = np.asarray(fa.bsr_spmm_fused(prep_s.fused, H, group=group))
    np.testing.assert_array_equal(og_s, o1)
    # value-mode plan (no rank-1 scalings)
    Av, matv = _weighted_graph(rng)
    monkeypatch.setattr(fa, "_MAX_STEPS", 8192)
    prep_v = prepare_adjacency(Av, method="hybrid", tb=128, rank1=False)
    Hv = jnp.asarray(
        rng.standard_normal((Av.n_cols, 128)).astype(np.float32)
    )
    ov1 = np.asarray(fa.bsr_spmm_fused(prep_v.fused, Hv))
    ovg = np.asarray(fa.bsr_spmm_fused(prep_v.fused, Hv, group=group))
    np.testing.assert_array_equal(ovg, ov1)


def test_resident_and_streamed_chunk_modes_match(rng, monkeypatch):
    """The VMEM-resident chunk payload mode (payload under budget) and
    the streamed fallback produce identical aggregations."""
    from sgracex1_tpu.ops import fused_agg as fa

    A, mat = _skewed_rank1_graph(rng, n=4096)
    prep = prepare_adjacency(A, method="hybrid", tb=128)
    H = jnp.asarray(rng.standard_normal((A.n_cols, 128)).astype(np.float32))
    res = np.asarray(fa.bsr_spmm_fused(prep.fused, H))
    monkeypatch.setattr(fa, "_RESIDENT_G_BUDGET", 0)
    stream = np.asarray(fa.bsr_spmm_fused(prep.fused, H))
    np.testing.assert_allclose(stream, res, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(res, mat @ np.asarray(H), rtol=2e-2,
                               atol=2e-2)
