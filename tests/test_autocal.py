"""Telemetry sowing and automatic calibration."""

import numpy as np
import jax
import jax.numpy as jnp

from sgracex1_tpu.graph.normalize import sym_norm
from sgracex1_tpu.nn.models import GCNModel
from sgracex1_tpu.quant.autocal import harvest_telemetry, calibrate
from tests.conftest import make_random_graph


def _setup(rng, n=64, f=8):
    A = sym_norm(make_random_graph(rng, n), n)
    x = jnp.asarray(rng.uniform(0, 2.0, (n, f)).astype(np.float32))
    model = GCNModel(num_features=f, hidden_channels=8, num_classes=3)
    params = model.init(jax.random.PRNGKey(0), A, x)
    return model, params, A, x


def test_harvest_telemetry_ranges(rng):
    model, params, A, x = _setup(rng)
    tel = harvest_telemetry(model, params, A, x)
    assert len(tel) == 2  # two conv layers
    first = list(tel.values())[0]
    np.testing.assert_allclose(
        first["x_amax"], float(jnp.max(jnp.abs(x))), rtol=1e-6
    )
    W1 = params["params"]["conv1"]["weight"]
    np.testing.assert_allclose(
        first["w_absmax"], float(jnp.max(jnp.abs(W1))), rtol=1e-6
    )
    assert first["wh_absmax"] > 0


def test_calibrate_builds_matching_table(rng):
    model, params, A, x = _setup(rng)
    cal = calibrate(model, params, A, x, qbits=8)
    tel = harvest_telemetry(model, params, A, x)
    l1 = list(tel.values())[0]
    assert cal.raw["f_max"] == max(l1["x_amax"], 1e-8)
    assert cal.raw["w_max"] == max(l1["w_absmax"], 1e-8)
    # quant params derive from the observed ranges
    assert cal.features.s > 0 and cal.weights.s > 0


def test_calibrated_qat_still_learns(rng):
    """QAT with an auto-calibrated table trains at least as well as the
    hand table on data whose ranges differ from the defaults."""
    from sgracex1_tpu.config import SGRACEConfig
    from sgracex1_tpu.graph.datasets import sbm_node_classification
    from sgracex1_tpu.train.loop import train_node_classifier

    data = sbm_node_classification(n=200, num_classes=2, seed=7)
    data_x5 = type(data)(
        edge_index=data.edge_index,
        x=data.x * 5.0,  # feature range far from the default [0, 1]
        y=data.y,
        train_mask=data.train_mask,
        val_mask=data.val_mask,
        test_mask=data.test_mask,
    )
    model_f = GCNModel(
        num_features=data.num_features, hidden_channels=16, num_classes=2
    )
    from sgracex1_tpu.graph.normalize import sym_norm as sn

    A = sn(data_x5.edge_index, data_x5.edge_index.max() + 1)
    params = model_f.init(
        jax.random.PRNGKey(0), A, jnp.asarray(data_x5.x)
    )
    cal = calibrate(model_f, params, A, jnp.asarray(data_x5.x), qbits=8)
    model_q = GCNModel(
        num_features=data.num_features,
        hidden_channels=16,
        num_classes=2,
        calibration=cal,
    )
    cfg = SGRACEConfig(hidden_channels=16, num_epochs=40, w_qbits=8)
    _, hist = train_node_classifier(model_q, data_x5, cfg)
    assert hist.best_test_acc > 0.8, hist.best_test_acc
