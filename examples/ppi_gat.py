"""Inductive multi-label GAT (the PPI protocol — BASELINE.json config 3).

Trains a 2-layer GAT with sigmoid BCE on multiple protein-interaction-style
graphs and reports micro-F1 on whole held-out graphs. Uses the real PPI raw
files if present (pass their directory, e.g. `python examples/ppi_gat.py
/data/ppi`), otherwise a synthetic analogue with the same task structure.
"""

import sys

from sgracex1_tpu.config import SGRACEConfig
from sgracex1_tpu.graph.datasets import load_ppi, synthetic_ppi
from sgracex1_tpu.nn.models import GATModel
from sgracex1_tpu.train.loop import train_multilabel_inductive


def main():
    if len(sys.argv) > 1:
        root = sys.argv[1]
        tr, va, te = (load_ppi(root, s) for s in ("train", "valid", "test"))
        print(f"PPI from {root}: {len(tr)}/{len(va)}/{len(te)} graphs")
    else:
        tr, va, te = synthetic_ppi(num_graphs=8, splits=(2, 2))
        print("synthetic PPI analogue (pass a data dir for the real thing)")

    g = tr[0]
    model = GATModel(
        num_features=g.num_features,
        hidden_channels=64,
        num_classes=g.num_labels,
        nheads=4,
        dropout=0.0,
    )
    cfg = SGRACEConfig(num_epochs=100, learning_rate=0.005)
    state, hist = train_multilabel_inductive(
        model, tr, va, te, cfg, log_every=10
    )
    print(f"best val micro-F1 {hist.best_test_acc:.4f}")
    print(f"final test micro-F1 {hist.test_acc[-1]:.4f}")


if __name__ == "__main__":
    main()
