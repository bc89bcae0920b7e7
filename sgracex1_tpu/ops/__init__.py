from sgracex1_tpu.ops.spmm import spmm, spmm_t, spmm_dense_rhs
from sgracex1_tpu.ops.sddmm import sddmm, edge_softmax
from sgracex1_tpu.ops.fused_gnn import gnn_layer, gat_attention

__all__ = [
    "spmm",
    "spmm_t",
    "spmm_dense_rhs",
    "sddmm",
    "edge_softmax",
    "gnn_layer",
    "gat_attention",
]
