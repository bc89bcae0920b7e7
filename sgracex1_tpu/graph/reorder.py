"""Bandwidth-reducing graph reordering for tile locality.

The Pallas SpMM kernel schedules edges by (row-block, col-block) tile
(ops/pallas_spmm.py); a graph whose node numbering scatters neighbors across
the index space produces many near-empty tiles and pathological edge
padding. RCM reordering concentrates edges near the diagonal, collapsing
the number of visited tiles — the preprocessing-side analogue of the
reference's SPMM_BLOCK row-grouping (matrix_mult.h:169,186-191), which
exists for the same reason: keep the pipeline full on sparse rows.

Spec: scipy's reverse_cuthill_mckee; fast path: csrc/sgrace_host.cpp
(sg_rcm_order). The two produce different (both valid) RCM orders — parity
is asserted on bandwidth reduction, not on the permutation itself.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from sgracex1_tpu.graph.csr import SparseMatrix


def rcm_order(A: SparseMatrix) -> np.ndarray:
    """Bandwidth-reducing permutation, perm[new_id] = old_id."""
    from sgracex1_tpu.runtime import native

    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    n = max(A.n_rows, A.n_cols)
    perm = native.rcm_order(n, r, c)
    if perm is not None:
        return perm.astype(np.int64)
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    m = sp.coo_matrix(
        (np.ones(A.nnz, np.float32), (r, c)), shape=(n, n)
    ).tocsr()
    return np.asarray(
        reverse_cuthill_mckee(m, symmetric_mode=False), dtype=np.int64
    )


def permute_graph(
    A: SparseMatrix, perm: np.ndarray, *, pad_to: int = 128
) -> Tuple[SparseMatrix, np.ndarray]:
    """Apply a node permutation: returns (P A P^T, inverse permutation).

    perm[new_id] = old_id; node features must be gathered as ``x[perm]``
    and outputs scattered back with the returned inverse (``out[inv]`` maps
    new-order rows back to original node ids).
    """
    n = max(A.n_rows, A.n_cols)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    r = inv[np.asarray(A.rows[: A.nnz])]
    c = inv[np.asarray(A.cols[: A.nnz])]
    v = np.asarray(A.vals[: A.nnz])
    return (
        SparseMatrix.from_coo(r, c, v, A.shape, pad_to=pad_to),
        inv,
    )


def bandwidth(A: SparseMatrix) -> int:
    """Max |row - col| over nonzeros — the quantity RCM minimizes."""
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    return int(np.abs(r - c).max()) if A.nnz else 0
