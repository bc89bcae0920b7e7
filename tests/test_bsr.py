"""BSR (dense-tile) aggregation backend."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.bsr import (
    bsr_from_sparse,
    bsr_spmm_xla,
    bsr_spmm_pallas,
)
from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul


def _graph(rng, n=520, density=0.02):
    mat = sp.random(
        n, n, density=density, format="csr", random_state=3
    ).astype(np.float32)
    mat.setdiag(0.5)
    return SparseMatrix.from_scipy(mat), mat


def test_bsr_build_roundtrip(rng):
    A, mat = _graph(rng, n=300)
    B = bsr_from_sparse(A, tb=128, dtype=jnp.float32)
    # reassemble the dense matrix from tiles
    dense = np.zeros((384, 384), np.float32)
    tiles = np.asarray(B.tiles)
    for t in range(B.num_tiles):
        rb, cb = int(B.tile_rb[t]), int(B.tile_cb[t])
        dense[rb * 128 : (rb + 1) * 128, cb * 128 : (cb + 1) * 128] += tiles[t]
    np.testing.assert_allclose(dense[:300, :300], mat.toarray(), rtol=1e-6)


def test_bsr_xla_and_pallas_match_scipy(rng):
    A, mat = _graph(rng)
    B = bsr_from_sparse(A, tb=128, dtype=jnp.float32)
    H = rng.standard_normal((A.n_cols, 64)).astype(np.float32)
    expect = mat @ H
    out_x = np.asarray(bsr_spmm_xla(B, jnp.asarray(H)))
    out_p = np.asarray(bsr_spmm_pallas(B, jnp.asarray(H)))
    np.testing.assert_allclose(out_x, expect, rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(out_p, expect, rtol=5e-2, atol=5e-2)


def test_bsr_dispatch_forward_backward(rng):
    A, mat = _graph(rng)
    prep = prepare_adjacency(A, method="bsr", tb=128)
    assert prep.kind == "bsr"
    H = jnp.asarray(rng.standard_normal((A.n_cols, 64)).astype(np.float32))
    out = np.asarray(agg_matmul(prep, H))
    np.testing.assert_allclose(out, mat @ np.asarray(H), rtol=5e-2, atol=5e-2)

    v = rng.standard_normal((A.n_rows, 64)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), v))(H)
    np.testing.assert_allclose(
        np.asarray(g), mat.T @ v, rtol=5e-2, atol=5e-2
    )


def test_auto_prefers_bsr_for_banded(rng):
    """A banded graph has few tiles -> auto picks bsr over dense."""
    n = 4000
    rows, cols = [], []
    for i in range(n):
        for d in (-1, 0, 1):
            j = i + d
            if 0 <= j < n:
                rows.append(i)
                cols.append(j)
    A = SparseMatrix.from_coo(
        np.array(rows), np.array(cols),
        np.ones(len(rows), np.float32), (n, n),
    )
    prep = prepare_adjacency(A, method="auto")
    # hybrid = bsr tiles + edge-path remainder; either keeps the band on
    # the MXU tile kernel, which is the property this test pins
    assert prep.kind in ("bsr", "hybrid"), prep.kind


def test_bsr_training_step(rng):
    """Training through the bsr backend optimizes (custom-VJP in anger)."""
    import optax
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.nn.models import GCNModel
    from tests.conftest import make_random_graph

    n = 200
    A = sym_norm(make_random_graph(rng, n), n)
    prep = prepare_adjacency(A, method="bsr", tb=128)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    model = GCNModel(num_features=8, hidden_channels=8, num_classes=3)
    params = model.init(jax.random.PRNGKey(0), prep, x)
    opt = optax.adam(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, prep, x)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_device_build_matches_host(rng, monkeypatch):
    """The on-device edge-scatter tile build (the path bench.py's 1M-node
    phase takes on TPU) must produce byte-identical tiles to the host
    scatter — including duplicate-edge accumulation and the multi-batch
    concat (forced here by shrinking the scratch cap)."""
    import sgracex1_tpu.ops.bsr as bsr_mod

    n, nnz, tb = 256, 1500, 32
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    # force duplicates so the scatter must accumulate
    r[::7] = r[0]
    c[::7] = c[0]
    v = rng.standard_normal(nnz).astype(np.float32)
    A = SparseMatrix.from_coo(r, c, v, (n, n))

    host = bsr_from_sparse(
        A, tb=tb, dtype=jnp.float32, cover_rows=True, cover_cols=True,
        device_build=False,
    )
    # multi-batch: cap the f32 scratch at 3 tiles' worth
    monkeypatch.setattr(
        bsr_mod, "_DEVICE_BUILD_BATCH_BYTES", 3 * tb * tb * 4
    )
    dev = bsr_from_sparse(
        A, tb=tb, dtype=jnp.float32, cover_rows=True, cover_cols=True,
        device_build=True,
    )
    np.testing.assert_array_equal(np.asarray(host.tile_rb), np.asarray(dev.tile_rb))
    np.testing.assert_array_equal(np.asarray(host.tile_cb), np.asarray(dev.tile_cb))
    np.testing.assert_allclose(
        np.asarray(host.tiles), np.asarray(dev.tiles), rtol=1e-6, atol=1e-6
    )


def test_bsr_transpose_spmm_matches_scipy(rng):
    """bsr_transpose(B) @ H == A.T @ H on the Pallas kernel — the prepare
    step derives the backward plan this way instead of a second host build
    (cover_cols guarantees the transpose still row-covers)."""
    A, mat = _graph(rng, n=300)
    from sgracex1_tpu.ops.bsr import bsr_transpose

    B = bsr_from_sparse(
        A, tb=128, dtype=jnp.float32, cover_rows=True, cover_cols=True
    )
    Bt = bsr_transpose(B)
    assert Bt.n_rows == A.n_cols and Bt.n_cols == A.n_rows
    # transposed tile set must be sorted by (new) row block for the kernel's
    # first-visit zeroing to work
    rb = np.asarray(Bt.tile_rb)
    assert np.all(np.diff(rb) >= 0)
    H = rng.standard_normal((A.n_rows, 64)).astype(np.float32)
    out = np.asarray(bsr_spmm_pallas(Bt, jnp.asarray(H)))
    # kernel computes in bf16 with f32 accumulation (the framework's dtype
    # policy) — tolerance sized for bf16 rounding, not f32
    np.testing.assert_allclose(
        out[: A.n_cols], mat.T @ H, rtol=3e-2, atol=3e-2
    )
    # and the tiles themselves reassemble A^T exactly
    pad = 128 * -(-300 // 128)
    d = np.zeros((pad, pad), np.float32)
    t = np.asarray(Bt.tiles)
    rb, cb = np.asarray(Bt.tile_rb), np.asarray(Bt.tile_cb)
    for i in range(len(rb)):
        d[rb[i] * 128:(rb[i] + 1) * 128, cb[i] * 128:(cb[i] + 1) * 128] += t[i]
    np.testing.assert_allclose(
        d[: A.n_cols, : A.n_rows], mat.T.toarray(), rtol=1e-6
    )


def test_packed_bitmask_spmm_matches_scipy(rng):
    """1-bit packed mask tiles through bsr_spmm_pallas: the kernel detects
    the packed shape and unpacks in-kernel; aggregation must match scipy
    on a {0,1} adjacency."""
    from sgracex1_tpu.ops.bsr import bsr_bitmask_from_sparse

    n = 1500
    mat = sp.random(n, n, density=0.004, format="csr", random_state=5)
    mat.data[:] = 1.0
    mat = mat.astype(np.float32)
    A = SparseMatrix.from_scipy(mat)
    B = bsr_bitmask_from_sparse(A, tb=1024, cover_rows=True, cover_cols=True)
    assert B.tiles.shape[-1] == 128 and B.tiles.dtype == jnp.uint8
    H = rng.standard_normal((A.n_cols, 32)).astype(np.float32)
    out = np.asarray(bsr_spmm_pallas(B, jnp.asarray(H)))
    np.testing.assert_allclose(
        out[:n], mat @ H, rtol=3e-2, atol=3e-2
    )


def test_bitmask_device_build_packs_per_batch(rng):
    """The device-build path packs each tile batch BEFORE concatenation
    (bounding the int8 intermediate at 2^22-node scale); the result must
    equal the host build+pack, including across multiple batches."""
    import sgracex1_tpu.ops.bsr as bsrmod
    from sgracex1_tpu.ops.bsr import bsr_bitmask_from_sparse

    n = 3000
    mat = sp.random(n, n, density=0.003, format="csr", random_state=11)
    mat.data[:] = 1.0
    A = SparseMatrix.from_scipy(mat.astype(np.float32))
    ref = bsr_bitmask_from_sparse(A, tb=1024, cover_rows=True,
                                  device_build=False)
    # force multiple device-build batches (1 tile per batch)
    old = bsrmod._DEVICE_BUILD_BATCH_BYTES
    bsrmod._DEVICE_BUILD_BATCH_BYTES = 1024 * 1024 * 4
    try:
        dev = bsr_bitmask_from_sparse(A, tb=1024, cover_rows=True,
                                      device_build=True)
    finally:
        bsrmod._DEVICE_BUILD_BATCH_BYTES = old
    assert dev.tiles.shape == ref.tiles.shape == (ref.num_tiles, 1024, 128)
    np.testing.assert_array_equal(np.asarray(dev.tiles), np.asarray(ref.tiles))
    np.testing.assert_array_equal(
        np.asarray(dev.tile_rb), np.asarray(ref.tile_rb)
    )


def test_rowloop_matches_scipy_all_formats(rng):
    """bsr_spmm_rowloop (grid over row blocks, double-buffered manual DMA
    over each row's tiles) must match scipy for value, int8 mask, and
    1-bit packed tile formats — including empty row blocks (cover tiles)
    and rows whose tile runs have odd/even lengths (both DMA slots)."""
    from sgracex1_tpu.ops.bsr import (
        bsr_bitmask_from_sparse,
        bsr_mask_from_sparse,
        bsr_spmm_rowloop,
    )

    n = 700
    mat = sp.random(n, n, density=0.01, format="csr", random_state=7)
    mat = mat.astype(np.float32)
    A = SparseMatrix.from_scipy(mat)
    H = rng.standard_normal((n, 128)).astype(np.float32)
    Bv = bsr_from_sparse(A, tb=64, dtype=jnp.float32, cover_rows=True)
    out = np.asarray(bsr_spmm_rowloop(Bv, jnp.asarray(H)))
    np.testing.assert_allclose(out[:n], mat @ H, rtol=5e-2, atol=5e-2)

    mat01 = (mat > 0).astype(np.float32)
    A01 = SparseMatrix.from_scipy(mat01)
    Bm = bsr_mask_from_sparse(A01, tb=64, cover_rows=True)
    out = np.asarray(bsr_spmm_rowloop(Bm, jnp.asarray(H)))
    np.testing.assert_allclose(out[:n], mat01 @ H, rtol=5e-2, atol=5e-2)

    Bp = bsr_bitmask_from_sparse(A01, tb=1024, cover_rows=True)
    out = np.asarray(bsr_spmm_rowloop(Bp, jnp.asarray(H)))
    np.testing.assert_allclose(out[:n], mat01 @ H, rtol=5e-2, atol=5e-2)


def test_pack_mask_bsr_matches_host_layout(rng):
    """Device pack == the documented bit-plane-major layout, and the
    in-kernel unpack inverts it."""
    from sgracex1_tpu.ops.bsr import (
        bsr_mask_from_sparse, pack_mask_bsr, unpack_mask01_tile,
    )

    n, tb = 900, 1024
    mat = sp.random(n, n, density=0.01, format="csr", random_state=7)
    mat.data[:] = 1.0
    A = SparseMatrix.from_scipy(mat.astype(np.float32))
    Bm = bsr_mask_from_sparse(A, tb=tb)
    Bp = pack_mask_bsr(Bm, batch_tiles=1)  # force the multi-batch path
    m = np.asarray(Bm.tiles).astype(np.uint8)
    tb8 = tb // 8
    planes = m.reshape(m.shape[0], tb, 8, tb8)
    expect = np.zeros((m.shape[0], tb, tb8), np.uint8)
    for j in range(8):
        expect |= planes[:, :, j, :] << j
    np.testing.assert_array_equal(np.asarray(Bp.tiles), expect)
    un = np.asarray(unpack_mask01_tile(jnp.asarray(Bp.tiles[0]), tb))
    np.testing.assert_array_equal(un, m[0].astype(np.float32))


def test_prepare_rank1_packed_tiles_parity(rng):
    """prepare_adjacency with tb=1024 on a sym-normalized graph stores
    1-bit packed mask tiles; forward and backward match scipy through the
    rank-1 scalings."""
    from sgracex1_tpu.graph.normalize import sym_norm
    from tests.conftest import make_random_graph

    n = 1200
    A = sym_norm(make_random_graph(rng, n, avg_degree=6), n)
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    v = np.asarray(A.vals[: A.nnz])
    mat = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()

    prep = prepare_adjacency(A, method="bsr", tb=1024)
    assert prep.r1_row is not None
    assert prep.bsr.tiles.dtype == jnp.uint8
    assert prep.bsr.tiles.shape[-1] == 128  # packed
    H = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    out = np.asarray(agg_matmul(prep, H))
    np.testing.assert_allclose(out, mat @ np.asarray(H), rtol=5e-2, atol=5e-2)
    vg = rng.standard_normal((n, 64)).astype(np.float32)
    g = jax.grad(lambda h: jnp.vdot(agg_matmul(prep, h), vg))(H)
    np.testing.assert_allclose(np.asarray(g), mat.T @ vg, rtol=5e-2, atol=5e-2)
