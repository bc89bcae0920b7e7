"""Integer int8 inference path: exactness of the corrected int8 matmuls and
end-to-end closeness to the float reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgracex1_tpu.quant.affine import QuantConstants, generate_constants
from sgracex1_tpu.quant.calibration import CalibrationTable
from sgracex1_tpu.quant import int8 as qi8


def _uc(beta=1.0, qbits=8):
    return generate_constants(0.0, beta, qbits, signed=False, w_qbits=qbits)


def _sc(absmax=1.0, qbits=8):
    return generate_constants(-absmax, absmax, qbits, signed=True, w_qbits=qbits)


def test_unsigned_x_signed_matmul_exact():
    """Shifted-int8 matmul + correction == exact integer product."""
    rng = np.random.default_rng(0)
    uq = rng.integers(0, 256, (37, 53)).astype(np.int64)  # unsigned grid
    sq = rng.integers(-127, 128, (53, 17)).astype(np.int64)
    us = jnp.asarray((uq - 128).astype(np.int8))
    acc = np.asarray(qi8.matmul_unsigned_x_signed(us, jnp.asarray(sq.astype(np.int8))))
    np.testing.assert_array_equal(acc, uq @ sq)


def test_quantize_roundtrip():
    c = _uc(beta=2.0)
    x = jnp.asarray(np.linspace(0, 2, 100, dtype=np.float32))
    xs = qi8.quantize_unsigned_shifted(x, c)
    xq = xs.astype(np.int32) + 128
    back = xq * c.s
    np.testing.assert_allclose(back, np.asarray(x), atol=c.s / 2 + 1e-7)


def test_int8_layer_close_to_float():
    """Integer layer output tracks the float GCN layer within quant error."""
    rng = np.random.default_rng(1)
    n, f, p = 64, 32, 16
    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    W = rng.uniform(-0.5, 0.5, (f, p)).astype(np.float32)
    A = (rng.uniform(size=(n, n)) < 0.1).astype(np.float32)
    A /= np.maximum(A.sum(1, keepdims=True), 1)

    c_x, c_w = _uc(1.0), _sc(0.5)
    c_a = _uc(1.0)
    h_absmax = float(np.abs(X @ W).max())
    layer = qi8.freeze_gcn_layer(W, c_x, c_w, c_a, h_absmax=h_absmax)

    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), c_x)
    a_s = qi8.dense_adjacency_int8(A, c_a)
    acc, scale = jax.jit(qi8.int8_gcn_layer)(layer, a_s, xs)
    out = np.asarray(qi8.dequantize_acc(acc, scale))

    expect = A @ (X @ W)
    err = np.abs(out - expect).max()
    scale_err = np.abs(expect).max()
    assert err < 0.05 * scale_err + 0.01, f"int8 err {err} vs range {scale_err}"


@pytest.mark.parametrize("qbits", [4, 2])
def test_subbyte_layer_close_to_float(qbits):
    """True integer inference at 4/2 bits: operands are constrained to the
    2^qbits grid (the reference's adaptive-quantization widths,
    matrix_mult.h:166-183 / sgrace.py:70-92) and the arithmetic runs on the
    int8 MXU — sub-byte values are exact in int8, so this IS the q-bit
    integer datapath. Looser closeness bound at narrower widths."""
    rng = np.random.default_rng(2)
    n, f, p = 64, 32, 16
    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    W = rng.uniform(-0.5, 0.5, (f, p)).astype(np.float32)
    A = (rng.uniform(size=(n, n)) < 0.1).astype(np.float32)
    A /= np.maximum(A.sum(1, keepdims=True), 1)

    c_x, c_w = _uc(1.0, qbits=qbits), _sc(0.5, qbits=qbits)
    c_a = _uc(1.0, qbits=qbits)
    h_absmax = float(np.abs(X @ W).max())
    layer = qi8.freeze_gcn_layer(W, c_x, c_w, c_a, h_absmax=h_absmax)

    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), c_x)
    # quantized operands must live on the q-bit grid
    assert int(xs.astype(np.int32).max()) + 128 <= 2**qbits - 1
    assert int(np.abs(np.asarray(layer.wq)).max()) <= 2 ** (qbits - 1) - 1
    a_s = qi8.dense_adjacency_int8(A, c_a)
    acc, scale = jax.jit(qi8.int8_gcn_layer)(layer, a_s, xs)

    # exact integer self-consistency: the TPU pipeline must equal a numpy
    # simulation over the same q-bit integer operands at any width
    Xq = np.asarray(xs).astype(np.int64) + 128
    Aq = np.asarray(a_s).astype(np.int64) + 128
    Wq = np.asarray(layer.wq).astype(np.int64)
    acc1 = Xq @ Wq
    hq = np.clip(
        np.round(acc1 * (layer.s_x * layer.s_w / layer.s_h)), -127, 127
    ).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(acc), Aq @ hq)

    if qbits == 4:
        # float closeness only where post-training quantization is sane;
        # the reference reaches <=2-bit accuracy via QAT, not PTQ
        out = np.asarray(qi8.dequantize_acc(acc, scale))
        expect = A @ (X @ W)
        err = np.abs(out - expect).max()
        rng_err = np.abs(expect).max()
        assert err < 0.35 * rng_err + 0.05, f"4-bit err {err} vs {rng_err}"


def test_relu_is_lower_clamp():
    """Requantize-to-unsigned zeroes negatives exactly like float ReLU."""
    acc = jnp.asarray(np.array([[-100, -1, 0, 1, 100]], np.int32))
    out = np.asarray(qi8.requantize_unsigned_shifted(acc, 1.0)).astype(np.int32) + 128
    np.testing.assert_array_equal(out[0], [0, 0, 0, 1, 100])


def test_int8_gat_layer_close_to_float():
    """Integer GAT layer tracks the float GAT within quantization error."""
    import jax.numpy as jnp
    from sgracex1_tpu.graph.csr import SparseMatrix
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.ops.fused_gnn import gat_layer

    rng = np.random.default_rng(3)
    n, f, h = 48, 16, 8
    ei = np.unique(
        np.stack([rng.integers(0, n, 300), rng.integers(0, n, 300)]), axis=1
    )
    A = sym_norm(ei, n)
    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    W = rng.uniform(-0.5, 0.5, (f, h)).astype(np.float32)
    att = rng.uniform(-0.5, 0.5, (2 * h, 1)).astype(np.float32)

    expect = np.asarray(
        gat_layer(A, jnp.asarray(X), jnp.asarray(W), jnp.asarray(att),
                  relu=False)
    )

    c_x, c_w = _uc(1.0), _sc(0.5)
    layer = qi8.freeze_gat_layer(
        W, att, c_x, c_w, h_absmax=float(np.abs(X @ W).max())
    )
    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), c_x)
    acc, scale = jax.jit(
        qi8.int8_gat_layer, static_argnames="n_nodes"
    )(layer, A.rows, A.cols, A.vals > 0, n, xs)
    out = np.asarray(qi8.dequantize_acc(acc, scale))

    rel = np.abs(out - expect).max() / (np.abs(expect).max() + 1e-9)
    assert rel < 0.08, f"int8 GAT relative err {rel}"


def test_gcn2_forward_close_to_float():
    rng = np.random.default_rng(2)
    n, f, h = 48, 24, 12
    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    W1 = rng.uniform(-0.5, 0.5, (f, h)).astype(np.float32)
    W2 = rng.uniform(-0.5, 0.5, (h, h)).astype(np.float32)
    A = (rng.uniform(size=(n, n)) < 0.15).astype(np.float32)
    A /= np.maximum(A.sum(1, keepdims=True), 1)

    # float reference
    h1 = np.maximum(A @ (X @ W1), 0.0)
    expect = A @ (h1 @ W2)

    cal = CalibrationTable.for_qbits(
        8,
        dict(w_min=-0.5, w_max=0.5, w_min2=-0.5, w_max2=0.5,
             f_min=0.0, f_max=1.0, a_min=0.0, a_max=float(A.max())),
    )
    net = qi8.freeze_gcn2(
        W1, W2, A, cal,
        h1_absmax=float(np.abs(X @ W1).max()),
        x2_absmax=float(h1.max()),
        h2_absmax=float(np.abs(h1 @ W2).max()),
    )
    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), cal.features)
    out = np.asarray(jax.jit(qi8.int8_gcn2_forward)(net, xs))

    rel = np.abs(out - expect).max() / (np.abs(expect).max() + 1e-9)
    assert rel < 0.08, f"2-layer int8 relative err {rel}"


def _banded_graph(rng, n, extra=2000):
    """Sym-normalized banded + random graph (tile-friendly, pubmed-shaped)."""
    import scipy.sparse as sp
    from sgracex1_tpu.graph.csr import SparseMatrix
    from sgracex1_tpu.graph.normalize import sym_norm

    rows, cols = [], []
    for d in (-2, -1, 1, 2):
        i = np.arange(max(0, -d), min(n, n - d))
        rows.append(i)
        cols.append(i + d)
    rows.append(rng.integers(0, n, extra))
    cols.append(rng.integers(0, n, extra))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    k = np.unique(r.astype(np.int64) * n + c)
    ei = np.stack([k // n, k % n])
    return sym_norm(ei, n)


def test_bsr_int8_spmm_exact():
    """bsr_spmm_int8 == the exact integer product of the quantized grids
    (per-tile shift correction included)."""
    from sgracex1_tpu.ops.bsr import bsr_spmm_int8

    rng = np.random.default_rng(3)
    n = 700
    A = _banded_graph(rng, n, extra=400)
    c_a = _uc(float(np.asarray(A.vals).max()) or 1.0)
    B = qi8.bsr_int8_from_sparse(A, c_a, tb=128)
    hq = rng.integers(-127, 128, (n, 32)).astype(np.int8)
    acc = np.asarray(bsr_spmm_int8(B, jnp.asarray(hq)))[:n]
    # exact integer reference on the quantized adjacency
    v = np.asarray(A.vals[: A.nnz])
    aq = np.clip(np.round(v / c_a.s + c_a.z), 0, c_a.beta_q)
    import scipy.sparse as sp

    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    mat = sp.coo_matrix((aq, (r, c)), shape=(n, n)).tocsr()
    np.testing.assert_array_equal(acc, (mat @ hq.astype(np.int64)))


def test_int8_gcn2_sparse_matches_dense_and_float():
    """Sparse-tile full-integer 2-layer GCN == the dense int8 form exactly,
    and both track the float forward — at a size past nothing, but the
    same code path runs at pubmed/1M scale (no dense N x N)."""
    rng = np.random.default_rng(4)
    n, f, h, p = 1500, 16, 12, 8
    A = _banded_graph(rng, n)
    mat = A.to_scipy()
    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    W1 = rng.uniform(-0.5, 0.5, (f, h)).astype(np.float32)
    W2 = rng.uniform(-0.5, 0.5, (h, p)).astype(np.float32)

    amax = qi8.collect_amax_gcn2_sparse(A, X, W1, W2)
    cal = CalibrationTable.for_qbits(
        8,
        dict(w_min=-0.5, w_max=0.5, w_min2=-0.5, w_max2=0.5,
             f_min=0.0, f_max=1.0, a_min=0.0,
             a_max=float(np.asarray(A.vals).max()) or 1.0),
    )
    net_s = qi8.freeze_gcn2_sparse(W1, W2, A, cal, tb=128, **amax)
    out_s = np.asarray(qi8.int8_gcn2_sparse_forward(net_s, jnp.asarray(
        np.asarray(qi8.quantize_unsigned_shifted(jnp.asarray(X), cal.features))
    )))[:n]

    net_d = qi8.freeze_gcn2(W1, W2, mat.toarray(), cal, **amax)
    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), cal.features)
    out_d = np.asarray(qi8.int8_gcn2_forward(net_d, xs))

    np.testing.assert_allclose(out_s, out_d, rtol=1e-5, atol=1e-5)
    # float reference
    h1 = np.maximum(mat @ (X @ W1), 0)
    ref = mat @ (h1 @ W2)
    err = np.abs(out_s - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.08, err


def test_int8_gat_flash_close_to_edge_path(rng):
    """int8 GAT with flash-tile aggregation tracks the per-edge int8 GAT
    (same quantized operands, different aggregation engine)."""
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse

    n, f, p = 900, 16, 8
    A = _banded_graph(rng, n, extra=800)
    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    W = rng.uniform(-0.5, 0.5, (f, p)).astype(np.float32)
    att = rng.uniform(-0.5, 0.5, (2 * p, 1)).astype(np.float32)
    c_x, c_w = _uc(1.0), _sc(0.5)
    layer = qi8.freeze_gat_layer(W, att, c_x, c_w, h_absmax=4.0)
    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), c_x)

    acc_e, sc_e = qi8.int8_gat_layer(
        layer, jnp.asarray(A.rows), jnp.asarray(A.cols),
        jnp.asarray(A.vals) > 0, n, xs,
    )
    out_e = np.asarray(acc_e, dtype=np.float64) * sc_e

    B = bsr_mask_from_sparse(A, tb=128)
    acc_f, sc_f = qi8.int8_gat_layer_flash(layer, B, xs)
    out_f = np.asarray(acc_f, dtype=np.float64) * sc_f

    denom = np.abs(out_e).max() + 1e-9
    assert np.abs(out_f - out_e).max() / denom < 0.03


def test_int8_hybrid_fused_exact(rng):
    """Hybrid full-integer aggregation (shifted-int8 tiles + quantized
    remainder chunks in one fused schedule) is EXACT integer math — the
    capability that runs the quantized engine at 2^20+ scale where a
    full-adjacency int8 tile set cannot fit."""
    import scipy.sparse as sp

    from sgracex1_tpu.graph.csr import SparseMatrix
    from sgracex1_tpu.ops.dispatch import split_by_tile_density

    n, f = 1600, 64
    # dense hub block + scattered tail -> a real hybrid split at tb=128
    mat = sp.random(n, n, density=0.001, format="lil",
                    random_state=11).astype(np.float32)
    mat[:256, :256] = rng.uniform(0.1, 1.0, (256, 256)).astype(np.float32)
    mat = mat.tocsr()
    A = SparseMatrix.from_scipy(mat)
    c_a = _uc(1.0)
    plan = qi8.prepare_int8_hybrid(A, c_a, tb=128, K=128)
    assert plan.num_rest_chunks > 0  # the tail must hit the chunk path

    X = rng.uniform(0, 1, (n, f)).astype(np.float32)
    xs = qi8.quantize_unsigned_shifted(jnp.asarray(X), _uc(1.0))
    acc = np.asarray(qi8.int8_hybrid_agg(plan, xs))[:n]

    # exact integer reference
    v = np.asarray(A.vals[: A.nnz])
    aq = np.clip(np.round(v / c_a.s + c_a.z), 0, c_a.beta_q)
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    mat_q = sp.coo_matrix((aq, (r, c)), shape=(n, n)).tocsr()
    expect = mat_q @ np.asarray(xs, dtype=np.int64)
    np.testing.assert_array_equal(acc, expect)

    # sliced schedules stay exact too
    import sgracex1_tpu.ops.fused_agg as fa

    if plan.num_steps > 6:
        orig = fa._MAX_STEPS
        try:
            fa._MAX_STEPS = 6
            slices_plan = qi8.prepare_int8_hybrid(A, c_a, tb=128, K=128)
        finally:
            fa._MAX_STEPS = orig
        assert len(slices_plan.slices) > 1
        acc2 = np.asarray(qi8.int8_hybrid_agg(slices_plan, xs))[:n]
        np.testing.assert_array_equal(acc2, expect)
