from sgracex1_tpu.parallel.mesh import make_mesh
from sgracex1_tpu.parallel.partition import ShardedGraph, partition_graph
from sgracex1_tpu.parallel.spmm_dist import (
    dist_spmm,
    dist_gnn_layer,
    dist_gat_layer,
)
from sgracex1_tpu.parallel.comm_model import (
    halo_comm,
    allgather_comm,
    predicted_efficiency,
)

__all__ = [
    "make_mesh",
    "ShardedGraph",
    "partition_graph",
    "dist_spmm",
    "dist_gnn_layer",
    "dist_gat_layer",
    "halo_comm",
    "allgather_comm",
    "predicted_efficiency",
]
