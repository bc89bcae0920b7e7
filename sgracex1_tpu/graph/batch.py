"""Graph batching for graph-level tasks (block-diagonal trick).

The reference's molecule notebook batches MUTAG graphs with PyG's DataLoader
(block-diagonal adjacency + per-node graph ids for global_mean_pool). Same
construction here, with static-shape padding: every batch is padded to fixed
node/edge counts so one XLA program serves all batches. Padding nodes form
isolated self-loop-free rows with zero features and belong to a dummy graph
slot whose pooled embedding is discarded via the label mask.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.graph.normalize import sym_norm_edges


@dataclasses.dataclass(frozen=True)
class GraphSample:
    """One graph: COO edge_index [2, E], node features [n, F], int label."""

    edge_index: np.ndarray
    x: np.ndarray
    y: int

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]


import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A padded block-diagonal batch of graphs (registered pytree)."""

    A: SparseMatrix  # [n_pad, n_pad] normalized block-diagonal adjacency
    x: np.ndarray  # [n_pad, F]
    graph_ids: np.ndarray  # int32[n_pad] — padding nodes map to num_graphs-1
    y: np.ndarray  # int32[g_pad]
    label_mask: np.ndarray  # bool[g_pad] — False for the padding slot
    num_graphs: int = dataclasses.field(metadata=dict(static=True))


def batch_graphs(
    graphs: Sequence[GraphSample],
    *,
    n_pad: int,
    g_pad: int,
    normalize: bool = True,
    pad_to: int = 128,
) -> GraphBatch:
    """Assemble graphs into one padded block-diagonal batch."""
    assert len(graphs) < g_pad, "need one spare graph slot for padding nodes"
    F = graphs[0].x.shape[1]
    x = np.zeros((n_pad, F), dtype=np.float32)
    gid = np.full(n_pad, g_pad - 1, dtype=np.int32)
    y = np.zeros(g_pad, dtype=np.int32)
    mask = np.zeros(g_pad, dtype=bool)

    rows, cols, offset = [], [], 0
    for i, g in enumerate(graphs):
        n = g.num_nodes
        assert offset + n <= n_pad, "batch exceeds n_pad"
        x[offset : offset + n] = g.x
        gid[offset : offset + n] = i
        y[i] = g.y
        mask[i] = True
        rows.append(g.edge_index[0] + offset)
        cols.append(g.edge_index[1] + offset)
        offset += n

    edge_index = np.stack(
        [np.concatenate(rows), np.concatenate(cols)]
    ).astype(np.int64)

    if normalize:
        # self-loops only for real nodes: sym_norm over the occupied prefix,
        # then re-embed into the padded index space
        ei, ew = sym_norm_edges(edge_index, offset)
        A = SparseMatrix.from_coo(
            ei[0], ei[1], ew, (n_pad, n_pad), pad_to=pad_to, sort=False
        )
    else:
        A = SparseMatrix.from_coo(
            edge_index[0],
            edge_index[1],
            np.ones(edge_index.shape[1], np.float32),
            (n_pad, n_pad),
            pad_to=pad_to,
        )
    return GraphBatch(
        A=A, x=x, graph_ids=gid, y=y, label_mask=mask, num_graphs=g_pad
    )


def make_batches(
    graphs: Sequence[GraphSample],
    batch_size: int,
    *,
    rng: Optional[np.random.Generator] = None,
    pad_to: int = 128,
) -> List[GraphBatch]:
    """Split a dataset into fixed-shape batches (shuffled if rng given)."""
    idx = np.arange(len(graphs))
    if rng is not None:
        rng.shuffle(idx)
    chunks = [idx[i : i + batch_size] for i in range(0, len(idx), batch_size)]
    max_nodes = max(
        sum(graphs[i].num_nodes for i in c) for c in chunks
    )
    n_pad = ((max_nodes + pad_to - 1) // pad_to) * pad_to
    g_pad = batch_size + 1
    batches = [
        batch_graphs([graphs[i] for i in c], n_pad=n_pad, g_pad=g_pad, pad_to=pad_to)
        for c in chunks
    ]
    # unify edge padding AND static nnz so all batches share one compiled
    # program (nnz is static jit metadata on SparseMatrix)
    e_pad = max(b.A.e_pad for b in batches)
    return [
        dataclasses.replace(
            b, A=b.A.pad_edges_to(e_pad).with_uniform_nnz()
        )
        for b in batches
    ]
