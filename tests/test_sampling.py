"""Neighbor sampling: structural invariants and sampled training."""

import numpy as np

from sgracex1_tpu.config import SGRACEConfig
from sgracex1_tpu.graph.datasets import sbm_node_classification
from sgracex1_tpu.graph.sampling import NeighborSampler, make_neighbor_batches
from sgracex1_tpu.nn.models import GCNModel
from sgracex1_tpu.train.loop import train_node_classifier_sampled


def test_sampler_structure(rng):
    data = sbm_node_classification(n=200, num_classes=2, seed=0)
    sampler = NeighborSampler(data.edge_index, data.num_nodes)
    seeds = np.array([3, 17, 50])
    ei, ids = sampler.sample(seeds, (5, 5), rng)
    # seeds first, all local indices valid, every edge's dst within 1 hop set
    np.testing.assert_array_equal(ids[:3], seeds)
    assert ei.min() >= 0 and ei.max() < len(ids)
    # edges are (dst_local, src_local) pulls: dst of hop-1 edges are seeds
    edge_set = set(map(tuple, ei.T))
    assert len(edge_set) == ei.shape[1]  # no duplicate sampled edges

    # fanout respected: each node has at most 5 in-edges per hop it was
    # expanded in (2 hops -> at most 10, seeds expanded once per hop)
    counts = np.bincount(ei[0], minlength=len(ids))
    assert counts.max() <= 10


def test_batches_static_shapes(rng):
    data = sbm_node_classification(n=300, num_classes=3, seed=1)
    train_nodes = np.nonzero(data.train_mask)[0]
    batches = make_neighbor_batches(
        data.edge_index, data.x, data.y, train_nodes,
        batch_size=32, fanouts=(4, 4), rng=rng,
    )
    assert len(batches) >= 2
    shapes = {(b.x.shape, b.A.e_pad, b.A.shape) for b in batches}
    assert len(shapes) == 1  # all batches share one compiled program
    for b in batches:
        assert b.seed_mask.sum() <= 32
        # seed features match the global rows
        k = int(b.seed_mask.sum())
        np.testing.assert_array_equal(b.x[:k], data.x[b.node_ids[:k]])


def test_sampled_training_learns():
    data = sbm_node_classification(n=400, num_classes=3, seed=2)
    cfg = SGRACEConfig(hidden_channels=16, num_epochs=15, learning_rate=0.01)
    model = GCNModel(
        num_features=data.num_features,
        hidden_channels=16,
        num_classes=data.num_classes,
    )
    _, hist = train_node_classifier_sampled(
        model, data, cfg, batch_size=64, fanouts=(8, 8)
    )
    assert hist.best_test_acc > 0.75, hist.best_test_acc
