"""Roofline cost models (utils/roofline.py) — the TPU-native analogue of the
reference's FIFO stall-counter decode (mmult-master.ipynb cells 39-40)."""

import numpy as np
import scipy.sparse as sp

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.dispatch import prepare_adjacency
from sgracex1_tpu.utils.roofline import (
    CostModel,
    cost_flash_gat,
    cost_for_prep,
)


def _adj(n=600, density=0.02):
    mat = sp.random(n, n, density=density, format="csr",
                    random_state=3).astype(np.float32)
    mat.setdiag(1.0)
    return SparseMatrix.from_scipy(mat)


def test_roofline_report_fields_and_bound():
    c = CostModel(flops=1e12, hbm_bytes=1e9)
    r = c.roofline(1.0)
    # 1 TF/s of 197 peak ~ 0.5% MXU; 1 GB/s of 819 ~ 0.12% HBM -> MXU-bound
    assert r["bound"] == "MXU"
    assert 0 < r["pct_mxu"] < 1.0
    assert r["pct_roofline"] == r["pct_mxu"]
    c2 = CostModel(flops=1e9, hbm_bytes=400e9)
    assert c2.roofline(1.0)["bound"] == "HBM"


def test_cost_models_per_backend():
    A = _adj()
    P = 32
    for method in ("dense", "bsr", "pallas", "xla"):
        prep = prepare_adjacency(A, method=method)
        c = cost_for_prep(prep, P)
        assert c.flops > 0 and c.hbm_bytes > 0, method
        assert method in c.note or c.note in ("xla-edges",), (method, c.note)
    # dense pays O(n^2) bytes; bsr strictly less when locality (here a
    # banded graph; in practice RCM reordering) leaves most tiles empty —
    # uniformly random sparsity hits every tile and dense legitimately
    # wins, which is exactly what the dispatch cost model exploits
    n = 6000
    rng = np.random.default_rng(0)
    r = np.arange(n).repeat(6)
    c = np.clip(r + rng.integers(-40, 40, len(r)), 0, n - 1)
    A_band = SparseMatrix.from_coo(
        r, c, np.ones(len(r), np.float32), (n, n)
    )
    cd = cost_for_prep(prepare_adjacency(A_band, method="dense",
                                         dense_max_bytes=1 << 30), P)
    cb = cost_for_prep(prepare_adjacency(A_band, method="bsr"), P)
    assert cb.hbm_bytes < cd.hbm_bytes
    # xla edge path FLOPs = 2*nnz*P exactly
    cx = cost_for_prep(prepare_adjacency(A, method="xla"), P)
    assert cx.flops == 2 * A.nnz * P


def test_hybrid_cost_is_sum_of_parts():
    A = _adj(n=1200, density=0.01)
    prep = prepare_adjacency(A, method="hybrid", dense_max_bytes=0)
    c = cost_for_prep(prep, 16)
    # hybrid preps now carry the fused one-pass schedule (r4), which the
    # cost model attributes as fused-hybrid
    assert c.note == "fused-hybrid"
    parts = cost_for_prep(
        prepare_adjacency(A, method="bsr"), 16
    )  # upper bound: full-bsr tiles >= hybrid's dense-tile subset
    assert c.flops > 0
    assert c.hbm_bytes > 0
    assert parts.flops >= 0  # smoke: both models evaluate


def test_flash_gat_cost_scales_with_heads():
    from sgracex1_tpu.ops.bsr import bsr_from_sparse

    A = _adj()
    B = bsr_from_sparse(A, tb=128)
    c1 = cost_flash_gat(B, F=32, H=1)
    c4 = cost_flash_gat(B, F=32, H=4)
    assert abs(c4.flops - 4 * c1.flops) < 1e-6 * c4.flops
    assert c4.hbm_bytes == 4 * c1.hbm_bytes


def test_flash_gat_bwd_cost_model():
    """The fused backward's cost model: two probability-recompute passes
    (2 exps/element), three tile matmuls of FLOPs, and a SOL report whose
    serial-mix floor exceeds the forward's (the backward does strictly
    more work per tile)."""
    from sgracex1_tpu.ops.bsr import bsr_from_sparse
    from sgracex1_tpu.utils.roofline import cost_flash_gat_bwd

    A = _adj()
    B = bsr_from_sparse(A, tb=128)
    f = cost_flash_gat(B, F=32)
    b = cost_flash_gat_bwd(B, F=32)
    assert b.transcendentals == 2 * f.transcendentals
    assert b.flops > 2.9 * f.flops * 32 / (32 + 4)  # ~3 matmuls vs 1
    assert b.vpu_ops > f.vpu_ops
    r = (f + b).roofline(1e-3)
    assert r["pct_sol"] > 0 and r["sol_bound"] in ("VPU", "MXU", "HBM",
                                                   "VPU+MXU")
