"""Model layer tests: shapes, quantized-path parity with the reference
emulation math, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.nn.layers import GCNConv, GATConv
from sgracex1_tpu.nn.models import GCNModel, GATModel, MoleculeGCN, global_mean_pool
from sgracex1_tpu.quant.calibration import CalibrationTable


def _graph(rng, n=24, density=0.2):
    mat = sp.random(n, n, density=density, format="csr", random_state=4)
    mat.setdiag(0.7)
    return SparseMatrix.from_scipy(mat), mat


def ref_quant_gcn_forward(adj_dense, x, w, table, layer_index, relu):
    """Numpy transcription of the reference emulation forward for GCN
    (FPYNQ_GAT.forward acc=0 branch, compute_attention=0 —
    sgrace.py:563-681), used as the oracle for the quantized layer."""
    p = table.layer_params(layer_index)
    qb = p.w_qbits

    def uq(v, c):  # quantization_ufbits
        if qb == 1:
            return np.clip(np.round(v / c.s + c.z), 0, 1) / 2.0
        return np.clip(np.round(v / c.s + c.z), c.alpha_q, c.beta_q) / 2 ** (qb - 1)

    def sq(v, c):  # quantization_fbits
        if qb == 1:
            return np.where(v / c.s + c.z < 0, -0.5, 0.5)
        return np.clip(np.round(v / c.s + c.z), c.alpha_q, c.beta_q) / 2 ** (qb - 1)

    x_q = uq(x, p.features)
    w_q = sq(w, p.weights)
    wh = x_q @ w_q
    iq = p.internal_quantization
    wh = wh / 2**p.scale_fea
    lim = (2**iq - 1) / 2**iq
    wh = np.clip(wh, -lim, lim)
    wh = np.round(wh * 10 ** (iq - 1)) / 10 ** (iq - 1)
    adj_q = uq(adj_dense, p.adjacency)
    out = adj_q @ wh
    if relu:
        out = np.maximum(out, 0)
    return out * p.deq_o


@pytest.mark.parametrize("qbits", [1, 2, 4, 8])
def test_quantized_gcnconv_matches_reference_emulation(rng, qbits):
    A, mat = _graph(rng)
    n = A.n_rows
    x = rng.uniform(0, 1, (n, 10)).astype(np.float32)
    w = rng.uniform(-0.09, 0.09, (10, 8)).astype(np.float32)
    table = CalibrationTable.for_qbits(qbits)

    layer = GCNConv(10, 8, quant=table.layer_params(0))
    params = {"params": {"weight": jnp.asarray(w)}}
    out = np.asarray(layer.apply(params, A, jnp.asarray(x), relu=True))
    expect = ref_quant_gcn_forward(mat.toarray(), x, w, table, 0, relu=True)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_gcn_model_shapes(rng):
    A, _ = _graph(rng)
    x = jnp.asarray(rng.random((24, 12)).astype(np.float32))
    model = GCNModel(num_features=12, hidden_channels=16, num_classes=5)
    params = model.init(jax.random.PRNGKey(0), A, x)
    out = model.apply(params, A, x)
    assert out.shape == (24, 5)


@pytest.mark.parametrize("nheads", [1, 2])
def test_gat_model_shapes(rng, nheads):
    A, _ = _graph(rng)
    x = jnp.asarray(rng.random((24, 12)).astype(np.float32))
    model = GATModel(
        num_features=12, hidden_channels=16, num_classes=5, nheads=nheads
    )
    params = model.init(jax.random.PRNGKey(0), A, x)
    out = model.apply(params, A, x)
    assert out.shape == (24, 5)
    # parameter shapes mirror the reference (sgrace.py:1176-1179)
    p1 = params["params"]["conv1"]
    assert p1["weight"].shape == (12, 16 * nheads)
    assert p1["attention"].shape == (2 * 16 * nheads, 1)


def test_quantized_models_run(rng):
    A, _ = _graph(rng)
    x = jnp.asarray(rng.uniform(0, 1, (24, 12)).astype(np.float32))
    for qbits in (1, 8):
        cal = CalibrationTable.for_qbits(qbits)
        model = GATModel(
            num_features=12, hidden_channels=8, num_classes=3, calibration=cal
        )
        params = model.init(jax.random.PRNGKey(0), A, x)
        out = model.apply(params, A, x)
        assert np.isfinite(np.asarray(out)).all()


def test_gcn_num_layers(rng):
    """layer_count parity: a 4-layer GCN builds, runs, and differs from 2."""
    import jax
    import jax.numpy as jnp
    from sgracex1_tpu.graph.normalize import sym_norm
    from tests.conftest import make_random_graph

    n = 60
    A = sym_norm(make_random_graph(rng, n), n)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    m4 = GCNModel(
        num_features=8, hidden_channels=8, num_classes=3, num_layers=4
    )
    params = m4.init(jax.random.PRNGKey(0), A, x)
    convs = [k for k in params["params"] if k.startswith("conv")]
    assert sorted(convs) == ["conv1", "conv2", "conv3", "conv4"]
    out = m4.apply(params, A, x)
    assert out.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gradients_flow_through_quantized_layers(rng):
    A, _ = _graph(rng)
    x = jnp.asarray(rng.uniform(0, 1, (24, 12)).astype(np.float32))
    cal = CalibrationTable.for_qbits(8)
    model = GCNModel(
        num_features=12, hidden_channels=8, num_classes=3, calibration=cal
    )
    params = model.init(jax.random.PRNGKey(0), A, x)

    def loss(p):
        return jnp.sum(model.apply(p, A, x) ** 2)

    grads = jax.grad(loss)(params)
    gw = grads["params"]["conv1"]["weight"]
    assert float(jnp.abs(gw).sum()) > 0  # STE passes gradient


def test_global_mean_pool(rng):
    x = jnp.asarray(rng.random((6, 4)).astype(np.float32))
    gid = jnp.asarray(np.array([0, 0, 1, 1, 1, 2], np.int32))
    out = np.asarray(global_mean_pool(x, gid, 3))
    xn = np.asarray(x)
    np.testing.assert_allclose(out[0], xn[:2].mean(0), rtol=1e-6)
    np.testing.assert_allclose(out[1], xn[2:5].mean(0), rtol=1e-6)
    np.testing.assert_allclose(out[2], xn[5], rtol=1e-6)


def test_molecule_model_shapes(rng):
    A, _ = _graph(rng)
    x = jnp.asarray(rng.random((24, 7)).astype(np.float32))
    gid = jnp.asarray((np.arange(24) // 8).astype(np.int32))
    model = MoleculeGCN(num_features=7, hidden_channels=64, num_classes=2)
    params = model.init(jax.random.PRNGKey(0), A, x, gid, 3)
    out = model.apply(params, A, x, gid, 3)
    assert out.shape == (3, 2)
