from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.graph.normalize import sym_norm, add_self_loops
from sgracex1_tpu.graph import io

__all__ = ["SparseMatrix", "sym_norm", "add_self_loops", "io"]
