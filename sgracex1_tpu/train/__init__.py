from sgracex1_tpu.train.loop import (
    train_node_classifier,
    train_graph_classifier,
    create_train_state,
)
from sgracex1_tpu.train.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "train_node_classifier",
    "train_graph_classifier",
    "create_train_state",
    "save_checkpoint",
    "load_checkpoint",
]
