from sgracex1_tpu.nn.layers import GCNConv, GATConv, ReluHW
from sgracex1_tpu.nn.models import GATModel, GCNModel, MoleculeGCN

__all__ = ["GCNConv", "GATConv", "ReluHW", "GATModel", "GCNModel", "MoleculeGCN"]
