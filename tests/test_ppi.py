"""Multi-label inductive (PPI-style) training — BASELINE.json config 3.

The reference has no PPI workload; this pins the framework-side capability
the baseline asks for: 2-layer GAT trained with sigmoid BCE on multiple
graphs, evaluated by micro-F1 on whole held-out graphs.
"""

import numpy as np
import pytest

from sgracex1_tpu.config import SGRACEConfig
from sgracex1_tpu.graph.datasets import synthetic_ppi, load_ppi
from sgracex1_tpu.nn.models import GATModel
from sgracex1_tpu.train.loop import micro_f1, train_multilabel_inductive


def test_micro_f1_definition():
    pred = np.array([[1, 0], [1, 1]], bool)
    tgt = np.array([[1, 1], [0, 1]], bool)
    # tp=2, fp=1, fn=1 -> f1 = 4/6
    assert micro_f1(pred, tgt) == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))
    assert micro_f1(np.zeros((2, 2), bool), np.zeros((2, 2), bool)) == 0.0


def test_synthetic_ppi_shapes():
    tr, va, te = synthetic_ppi(num_graphs=6, splits=(1, 1), seed=3)
    assert len(tr) == 4 and len(va) == 1 and len(te) == 1
    g = tr[0]
    assert g.y.shape == (g.num_nodes, g.num_labels)
    assert set(np.unique(g.y)) <= {0.0, 1.0}
    assert g.y.sum(1).min() >= 1  # every node labelled
    # undirected
    es = set(map(tuple, g.edge_index.T))
    assert all((b, a) in es for a, b in es)


def test_gat_multilabel_inductive_learns():
    tr, va, te = synthetic_ppi(
        num_graphs=5, n_per=160, num_features=24, num_labels=8,
        splits=(1, 1), seed=7,
    )
    model = GATModel(
        num_features=24, hidden_channels=32, num_classes=8, nheads=2,
        dropout=0.0,
    )
    cfg = SGRACEConfig(num_epochs=30, learning_rate=0.01)
    state, hist = train_multilabel_inductive(model, tr, va, te, cfg)
    # labels are recoverable from features+neighborhood: inductive micro-F1
    # on held-out graphs must clearly beat the all-positive baseline (~0.4).
    # Measured: ~0.65-0.69 by epoch 30 (keeps the test fast; the curve keeps
    # rising past 0.69 at 60 epochs).
    assert hist.test_acc[-1] > 0.6, hist.test_acc[-5:]
    assert hist.best_params is not None


def test_load_ppi_raw_format(tmp_path):
    """Fabricate the torch_geometric PPI raw layout and parse it back."""
    import json

    rng = np.random.default_rng(0)
    # two graphs: nodes 0-3 and 4-6
    gid = np.array([0, 0, 0, 0, 1, 1, 1])
    links = [
        dict(source=0, target=1),
        dict(source=2, target=3),
        dict(source=4, target=5),
        dict(source=5, target=6),
    ]
    feats = rng.standard_normal((7, 5)).astype(np.float32)
    labels = (rng.random((7, 3)) < 0.5).astype(np.int64)
    with open(tmp_path / "train_graph.json", "w") as f:
        json.dump(dict(links=links), f)
    np.save(tmp_path / "train_feats.npy", feats)
    np.save(tmp_path / "train_labels.npy", labels)
    np.save(tmp_path / "train_graph_id.npy", gid)

    graphs = load_ppi(str(tmp_path), "train")
    assert len(graphs) == 2
    assert graphs[0].num_nodes == 4 and graphs[1].num_nodes == 3
    np.testing.assert_array_equal(graphs[1].x, feats[4:])
    np.testing.assert_array_equal(graphs[1].y, labels[4:].astype(np.float32))
    # symmetrized, graph-local ids
    es = set(map(tuple, graphs[1].edge_index.T))
    assert (0, 1) in es and (1, 0) in es and (1, 2) in es
