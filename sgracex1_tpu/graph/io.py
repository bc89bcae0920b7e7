"""Loaders for the reference's on-disk dataset formats.

The reference datasets (``gnn-rfsoc-mt-all-2022/data/matrices/*.txt``) come in
two text formats, parsed in C++ by ``main_float.cpp``:

- 3-line CSR: line 1 = rowPtr, line 2 = colIdx, line 3 = values, all
  comma-separated (``loadcsr_adj``/``loadcsr_fea`` — main_float.cpp:415-659).
  Some files omit the values line (e.g. binary feature matrices) — values
  default to 1.0, matching how the molecule notebook consumes them.
- Dense: one comma-separated row per line (``load_fea``/``load_weights`` —
  main_float.cpp:138-319). We keep row-major [rows, cols]; the reference's
  column-major transpose is an FPGA memory-layout detail that does not apply.

A C++ fast path (csrc/sgrace_io.cpp) is used when the native extension is
built; the numpy path below is the always-available fallback and the spec.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from sgracex1_tpu.graph.csr import SparseMatrix

# Reference dataset descriptors (main_float.cpp:40-111). The hidden width
# P_w comes from the weights file itself (descriptor values vary per build).
REFERENCE_DATASETS = {
    "mol": dict(N_adj=2273, M_fea=7, NNZ_adj=5028, NNZ_fea=6819),
    "cora": dict(N_adj=2708, M_fea=1433, NNZ_adj=13264, NNZ_fea=49216),
    "citeseer": dict(N_adj=3327, M_fea=3703, NNZ_adj=12431, NNZ_fea=105165),
    "pubmed": dict(N_adj=19717, M_fea=500, NNZ_adj=108365, NNZ_fea=988031),
}


def _parse_line(line: str, dtype) -> np.ndarray:
    line = line.strip().rstrip(",")
    if not line:
        return np.zeros(0, dtype=dtype)
    return np.array(line.split(","), dtype=dtype)


def load_csr_text(
    path: str, n_cols: Optional[int] = None, *, pad_to: int = 128
) -> SparseMatrix:
    """Parse the 3-line CSR text format into a SparseMatrix."""
    from sgracex1_tpu.runtime import native

    parsed = native.load_csr_text(path) if os.path.exists(path) else None
    if parsed is not None:
        rowptr, cols, vals = parsed
        nc = n_cols if n_cols is not None else (
            int(cols.max()) + 1 if len(cols) else 0
        )
        return SparseMatrix.from_csr_arrays(
            rowptr, cols, vals, nc, pad_to=pad_to
        )
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    if len(lines) < 2:
        raise ValueError(f"{path}: expected >=2 lines (rowPtr, colIdx[, values])")
    rowptr = _parse_line(lines[0], np.int64)
    cols = _parse_line(lines[1], np.int64)
    nnz = int(rowptr[-1])
    if len(lines) >= 3:
        vals = _parse_line(lines[2], np.float32)
        if len(vals) < nnz:  # some files truncate the values line
            vals = np.concatenate([vals, np.ones(nnz - len(vals), np.float32)])
        vals = vals[:nnz]
    else:
        vals = np.ones(nnz, dtype=np.float32)
    cols = cols[:nnz]
    if n_cols is None:
        n_cols = int(cols.max()) + 1 if nnz else 0
    return SparseMatrix.from_csr_arrays(rowptr, cols, vals, n_cols, pad_to=pad_to)


def load_dense_text(path: str) -> np.ndarray:
    """Parse the dense one-row-per-line comma-separated format."""
    from sgracex1_tpu.runtime import native

    parsed = native.load_dense_text(path) if os.path.exists(path) else None
    if parsed is not None:
        return parsed
    rows = []
    with open(path) as f:
        for ln in f:
            if ln.strip():
                rows.append(_parse_line(ln, np.float32))
    width = max(len(r) for r in rows)
    out = np.zeros((len(rows), width), dtype=np.float32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def reference_data_dir() -> Optional[str]:
    """The reference dataset directory, if the reference mount exists."""
    for cand in (
        os.environ.get("SGRACE_DATA_DIR"),
        "/root/reference/gnn-rfsoc-mt-all-2022/data/matrices",
        os.path.join(os.path.dirname(__file__), "..", "..", "data", "matrices"),
    ):
        if cand and os.path.isdir(cand):
            return cand
    return None


def load_reference_dataset(
    name: str, data_dir: Optional[str] = None, *, pad_to: int = 128
) -> Tuple[SparseMatrix, SparseMatrix, np.ndarray]:
    """Load (adj, features, weights) for a reference dataset by name.

    Matches the per-dataset descriptors of main_float.cpp:40-111:
    ``{name}_adj.txt`` (CSR, N x N), ``{name}_feat.txt`` (CSR, N x M),
    ``{name}_weights.txt`` (dense, M x P).
    """
    data_dir = data_dir or reference_data_dir()
    if data_dir is None:
        raise FileNotFoundError(
            "reference dataset directory not found; set SGRACE_DATA_DIR"
        )
    desc = REFERENCE_DATASETS[name]
    adj = load_csr_text(
        os.path.join(data_dir, f"{name}_adj.txt"), desc["N_adj"], pad_to=pad_to
    )
    feat_path = os.path.join(data_dir, f"{name}_feat.txt")
    if os.path.exists(feat_path):
        fea = load_csr_text(feat_path, desc["M_fea"], pad_to=pad_to)
    else:
        # pubmed's feature file is not vendored (the reference's own pubmed
        # descriptor points at cora paths, main_float.cpp:66-75);
        # synthesize binary features with the descriptor's dims/nnz
        rng = np.random.default_rng(0)
        n, m, nnz = desc["N_adj"], desc["M_fea"], desc["NNZ_fea"]
        rows = rng.integers(0, n, nnz)
        cols = rng.integers(0, m, nnz)
        fea = SparseMatrix.from_coo(
            rows, cols, np.ones(nnz, np.float32), (n, m), pad_to=pad_to
        )
    w = load_dense_text(os.path.join(data_dir, f"{name}_weights.txt"))
    return adj, fea, w
