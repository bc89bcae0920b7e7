"""Aggregation backend dispatch.

One adjacency, three execution strategies — the analogue of the reference's
compile-time datatype/thread configs (matrix_mult.h), chosen at prepare time
instead of synthesis time:

- 'dense': the adjacency is materialized as a dense bf16 matrix once and
  aggregation is a single MXU matmul. The fastest path for graphs up to
  ~12k nodes (measured 3-4x over gather/scatter at citeseer size) — and an
  honest reflection of the reference's own regime, which is capped at
  N <= 6144 on-chip (matrix_mult.h:43-45).
- 'bsr': nonempty dense tiles, one MXU matmul per tile (ops/bsr.py) — the
  preferred path for graphs with tile locality (apply graph/reorder RCM
  first); ~3x fewer FLOPs/bytes than dense on the reference datasets.
- 'pallas': the tiled one-hot double-matmul kernel (ops/pallas_spmm.py) for
  large graphs without tile structure.
- 'hybrid': per-tile split — tiles dense enough that one MXU tile-matmul
  beats per-edge gather run on the BSR kernel, the sparse remainder runs on
  the XLA edge path. The winning strategy for power-law graphs, whose hub
  rows/columns form dense stripes while tail-tail edges are uniformly
  scattered (degree skew is SURVEY §7 hard part 4; the reference's
  SPMM_BLOCK row grouping is the same adapt-layout-to-skew idea).
- 'xla': gather + segment_sum (ops/spmm.py) — fallback, always correct,
  differentiates natively.

prepare_adjacency runs on the host once per graph; agg_matmul is the in-jit
dispatch. The dense matrix is built host-side and chunk-uploaded: scatter
ops (even jitted) are pathologically slow on the TPU backend used here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.spmm import spmm, spmm_into, spmm_t
from sgracex1_tpu.ops.pallas_spmm import (
    SpMMPlan,
    plan_spmm,
    plan_with_vals,
    spmm_pallas,
)
from sgracex1_tpu.ops.bsr import (
    BSRMatrix,
    bsr_from_sparse,
    bsr_spmm_pallas,
    bsr_transpose,
)
from sgracex1_tpu.utils.transfer import chunked_device_put

DENSE_MAX_BYTES = 512 << 20  # dense bf16 adjacency budget (~16k nodes)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedAdjacency:
    """An adjacency prepared for a specific aggregation backend.

    Always carries the COO arrays (edge-level ops — GAT attention — need
    them regardless of the matmul backend). The pallas backend carries a
    separately-built transpose plan for the backward pass (a transposed
    schedule cannot be derived in-jit: group ordering must follow the
    *output* row blocks).
    """

    A: SparseMatrix
    dense: Optional[jax.Array]
    plan: Optional[SpMMPlan]
    plan_t: Optional[SpMMPlan]
    bsr: Optional[BSRMatrix] = None
    bsr_t: Optional[BSRMatrix] = None
    # hybrid backend: edges NOT covered by the dense tiles (and the mask
    # tiles GATConv's flash path reads — always the FULL adjacency)
    rest: Optional[SparseMatrix] = None
    gat_bsr: Optional[BSRMatrix] = None
    # hybrid flash-attention split: edges NOT covered by gat_bsr's dense
    # tiles, and the fused-style schedule that runs them as in-kernel
    # chunk steps. When present, GATConv runs
    # ops/flash_gat.gat_attention_agg_hybrid (gat_plan.B is gat_bsr;
    # gat_rest feeds the backward's per-edge remainder reductions).
    gat_rest: Optional[SparseMatrix] = None
    gat_plan: Optional[object] = None
    # rank-1 adjacency factorization (graph/normalize.rank1_factor): when
    # set, bsr/bsr_t hold exact int8 {0,1} MASK tiles and
    # A @ H == r1_row * (M @ (r1_col * H)) + rest @ H — half the tile HBM
    # traffic of bf16 value tiles, no value-rounding error
    r1_row: Optional[jax.Array] = None
    r1_col: Optional[jax.Array] = None
    # fully-fused schedules (ops/fused_agg): tiles + remainder chunks +
    # rank-1 scalings in one kernel pass per direction. When present,
    # agg_matmul prefers them over the bsr/rest composition above.
    fused: Optional[object] = None
    fused_t: Optional[object] = None
    kind: str = dataclasses.field(default="xla", metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.A.n_rows

    @property
    def flash_tiles(self) -> Optional[BSRMatrix]:
        """BSR tiles for the flash-GAT kernel: the dedicated mask tiles
        if attached (for_gat=True), else the value tiles when the
        aggregation backend already holds the whole adjacency densified.
        The hybrid backend's partial ``bsr`` is NOT a valid flash mask —
        and when ``gat_plan`` is set, ``gat_bsr`` covers only the DENSE
        attention tiles (the remainder rides gat_plan's chunks), so
        consumers must go through gat_attention_agg_hybrid, as GATConv
        does."""
        if self.gat_bsr is not None:
            return self.gat_bsr
        return self.bsr if self.kind == "bsr" else None

    def with_vals(self, vals: jax.Array) -> "SparseMatrix":
        """Edge-value substitution (attention weights) — returns the COO
        matrix; attention aggregation uses the edge path."""
        return self.A.with_vals(vals)


# measured on the v5e relay (2026-08): effective HBM read bandwidth and
# Backend-choice cost constants, CALIBRATED against the r3 on-chip 1M-node
# sweep (benchmarks/diag_1m*.py, 2026-08-20): the BSR grid kernel's
# measured per-tile seconds are 1.73u (tb=512 int8), 3.96u (tb=1024 int8),
# 3.25u (tb=1024 packed) — reproduced within ~8% by an effective streaming
# bandwidth of ~450 GB/s plus 0.5 us/grid-step, and the edge path measures
# ~50 ns/edge at 1M rows (HBM random-access bound: one 512 B row gather +
# one scatter per edge; the earlier 12 ns figure was measured at pubmed
# size where the working set is cache-resident).
_HBM_BPS = 450e9
_STEP_S = 0.5e-6
_PALLAS_GROUP_S = 7e-6  # one-hot kernel, be=1024 (measured pubmed/citeseer)
_XLA_EDGE_S = 50e-9  # gather + scatter-add per edge (measured at 2^20 rows)
_MXU_FLOPS = 180e12  # sustained bf16 (matmul microbench ~190 TF/s peak)
_VPU_OPS = 3.4e12  # measured elementwise f32 (benchmarks/bench_vpu_cal.py)
# fused-remainder path (ops/fused_agg, r4): rest edges ride one-hot chunk
# steps inside the tile kernel instead of the XLA scatter, so their cost
# is per-CHUNK (grid step + K-slot G DMA + onehot matmul) plus a ~5 ns
# per-slot gather — not 50 ns/edge of random HBM writes
_REST_CHUNK_S = 0.7e-6  # K=128 chunk: step overhead + max(DMA, MXU)
_REST_SLOT_S = 5e-9  # gather one bf16 row + write one G slot
_REST_K = 128


def _tile_itemsize(tb: int, rank1: bool, dense_itemsize: int) -> float:
    """Bytes per tile element: 1-bit packed masks when the rank-1 pack is
    lane-aligned (tb/8 a multiple of 128), int8 masks otherwise; value
    tiles carry the dense dtype."""
    if not rank1:
        return float(dense_itemsize)
    return 0.125 if tb % 8 == 0 and (tb // 8) % 128 == 0 else 1.0


def _tile_cost_s(tb: int, itemsize: float) -> float:
    """Seconds to process one dense BSR tile: max of DMA time (tile bytes +
    H-block read + output write) and compute time (MXU matmul + the VPU
    unpack for 1-bit packed tiles), plus the per-grid-step overhead —
    Mosaic double-buffers block DMA against compute."""
    dma = (tb * tb * itemsize + tb * 128 * 2 * 2) / _HBM_BPS
    mxu = 2.0 * tb * tb * 128 / _MXU_FLOPS
    vpu = (tb * tb * 4.0 / _VPU_OPS) if itemsize < 1 else 0.0
    return max(dma, mxu + vpu) + _STEP_S


def _estimate_backend_costs(
    A: SparseMatrix, dense_dtype, tbs=(128, 256, 512, 1024),
    rank1: bool = False,
):
    """Rough per-aggregation seconds for each backend — calibrated against
    measured sweeps (citeseer: dense 19us > bsr; pubmed RCM: bsr512 0.58ms
    < pallas 0.75ms < dense 1.04ms). Lane width 128 is the padded P.

    ``rank1`` marks a detected rank-1 factorization: tiles are stored as
    {0,1} masks — int8, or 1-bit packed when tb/8 is lane-aligned
    (_tile_itemsize).

    Returns (costs dict, best bsr tile size, best (tile size, nnz threshold)
    for the hybrid split)."""
    itemsize = jnp.dtype(dense_dtype).itemsize
    n = max(A.n_rows, A.n_cols)
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    costs = {
        "dense": n * n * itemsize / _HBM_BPS + _STEP_S,
        "xla": A.nnz * _XLA_EDGE_S + _STEP_S,
    }
    best_tb, best_t = None, np.inf
    best_hy, best_hy_t = None, np.inf
    for tb in tbs:
        uniq, counts = np.unique(
            (r // tb).astype(np.int64) * (1 << 32) + c // tb,
            return_counts=True,
        )
        if len(counts) == 0:
            uniq = np.zeros(1, np.int64)
            counts = np.ones(1, np.int64)
        tc = _tile_cost_s(tb, _tile_itemsize(tb, rank1, itemsize))
        t = len(counts) * tc
        if t < best_t:
            best_tb, best_t = tb, t
        # hybrid: a tile goes dense iff one tile-matmul beats its edges on
        # the fused remainder path (r4: per-slot gather + amortized chunk
        # steps, NOT the old 50 ns/edge XLA scatter)
        thresh = int(np.ceil(tc / (_REST_SLOT_S + _REST_CHUNK_S / _REST_K)))
        dense_tiles = counts >= thresh
        rest_by_rb = np.bincount(
            (uniq >> 32)[~dense_tiles].astype(np.int64),
            weights=counts[~dense_tiles].astype(np.float64),
        )
        n_chunks = int(np.ceil(rest_by_rb / _REST_K).sum())
        t_hy = (
            int(dense_tiles.sum()) * tc
            + n_chunks * _REST_CHUNK_S
            + int(counts[~dense_tiles].sum()) * _REST_SLOT_S
            + _STEP_S
        )
        if t_hy < best_hy_t:
            best_hy, best_hy_t = (tb, thresh), t_hy
    costs["bsr"] = best_t
    costs["hybrid"] = best_hy_t
    # one-hot kernel: groups = tiles' edges padded to be=1024 slots
    rb_, cb_ = 1024, 1024
    keys = (r // rb_).astype(np.int64) * (1 << 32) + c // cb_
    _, counts = np.unique(keys, return_counts=True)
    n_groups = int(np.sum(-(-counts // 1024))) if len(counts) else 1
    costs["pallas"] = n_groups * _PALLAS_GROUP_S
    return costs, best_tb, best_hy


def split_by_tile_density(
    A: SparseMatrix, tb: int, thresh: int
) -> tuple[SparseMatrix, SparseMatrix]:
    """Split edges into (dense-tile population, remainder): an edge is
    'dense' when its (row//tb, col//tb) tile holds >= thresh edges."""
    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    v = np.asarray(A.vals[: A.nnz])
    key = (r // tb).astype(np.int64) * (1 << 32) + c // tb
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    m = counts[inv] >= thresh if len(counts) else np.zeros(0, bool)
    shape = (A.n_rows, A.n_cols)
    return (
        SparseMatrix.from_coo(r[m], c[m], v[m], shape),
        SparseMatrix.from_coo(r[~m], c[~m], v[~m], shape),
    )


# flash kernel per-tile seconds, MEASURED on the attached v5e (r5
# decompositions at 2^20 nodes). Two components per tile size: a
# long-run base (full-cover schedules: 59794 tb=256 tiles -> 52.1 ms =
# 0.87 us; 21108 tb=1024 -> 88.4 ms = 4.19 us) plus a per-RUN drain
# (each output-block change drains in-flight DMA: dense splits at 2.2
# tiles/run measured 1.48 us/tile at tb=256 and 5.93 at tb=1024 —
# DESIGN §1.2d).
_FLASH_TILE_S = {256: 0.87e-6, 512: 2.2e-6, 1024: 4.19e-6}
_FLASH_RUN_S = {256: 0.61e-6, 512: 1.6e-6, 1024: 3.86e-6}
_FLASH_ELT_S = 3.5e-12  # fallback for tile sizes outside the table
# measured packed-tile penalty: the [tb, tb] VPU unpack of 1-bit masks
# adds ~7% per tile (r3, pubmed packed 0.77 vs int8 0.72 ms)
_FLASH_PACKED_MULT = 1.07
# int8 full-adjacency mask budget before falling back to 1-bit packed
# tb=1024 tiles (packing needs tb/8 lane-aligned, so only 1024 packs)
_FLASH_TILE_BUDGET = 4 << 30
# hybrid flash chunks: VMEM-RESIDENT payloads cost ~0.45 us per chunk
# (score grid + one-hot MXU; the bulk DMA amortizes); payloads past the
# residency budget stream per-step at a measured ~6.7 us of exposed
# small-DMA latency per chunk (flash_gat._RESIDENT_CHUNK_BUDGET). The
# payload estimate assumes a bench-typical head width (prepare time
# does not know the layer's true H*F).
_FLASH_CHUNK_K = 128
_FLASH_CHUNK_RES_S = 0.45e-6
_FLASH_CHUNK_STREAM_S = 6.7e-6
_FLASH_PAYLOAD_F = 64  # assumed H*(F+1) for the residency estimate
# training weights: the fused backward runs TWO more tile passes (row +
# col) of comparable per-tile cost, while the hybrid's remainder
# gradient rides the edge path (per-edge segment reductions — measured
# ~60 ns/edge effective at pubmed scale plus a fixed merge cost).
# r5 bench caught the fwd-only chooser regressing the pubmed TRAIN step
# 3.09 -> 5.55 ms: the hybrid's fwd win (0.72 -> 0.58) lost more in its
# edge-path backward (~20 XLA segment/gather ops: the fixed term is
# ~0.8 ms at pubmed scale, larger than the per-edge term there).
_FLASH_TRAIN_PASSES = 3.0
_FLASH_EDGE_BWD_S = 60e-9
_FLASH_BWD_FIXED_S = 800e-6
# fixed cost of engaging the hybrid path (the in-jit slot gathers and
# head-major reshapes around the kernel) — keeps small graphs where the
# full cover is already sub-ms (pubmed) from flapping to hybrid for
# marginal modeled wins
_FLASH_HYBRID_FIXED_S = 50e-6


def _flash_tile_s(tb: int, packed: bool) -> float:
    base = _FLASH_TILE_S.get(tb, tb * tb * _FLASH_ELT_S + _STEP_S)
    return base * (_FLASH_PACKED_MULT if packed else 1.0)


def _flash_run_s(tb: int) -> float:
    return _FLASH_RUN_S.get(tb, tb * 3.8e-9)


def _flash_chunk_s(
    tb: int, n_chunks: int = 1, K: int = _FLASH_CHUNK_K
) -> float:
    """Per-chunk seconds at this chunk population: resident when the
    payload estimate fits the VMEM budget, else streamed."""
    from sgracex1_tpu.ops.flash_gat import _RESIDENT_CHUNK_BUDGET

    payload = n_chunks * K * (_FLASH_PAYLOAD_F + 9) * 4
    if payload <= _RESIDENT_CHUNK_BUDGET:
        return _FLASH_CHUNK_RES_S
    return _FLASH_CHUNK_STREAM_S



def _choose_flash_tb(A: SparseMatrix, n: int) -> tuple[int, bool]:
    """(tb, packed) for FULL-cover flash-GAT mask tiles (legacy entry —
    prepare_adjacency uses _choose_flash_plan, which also considers the
    hybrid tile/edge split)."""
    tb, packed, _ = _choose_flash_plan(A, n, hybrid=False)
    return tb, packed


def _choose_flash_plan(
    A: SparseMatrix, n: int, *, hybrid: bool = True, train: bool = True
) -> tuple[int, bool, Optional[int]]:
    """(tb, packed, rest_thresh) for the flash-GAT attention path, by the
    measured model ``T(tb) * (tb^2 * elt + step)`` over this graph's
    ACTUAL tile populations.

    The balance flips with scale: at pubmed (184 tb=1024 tiles) the
    grid-step overhead dominates and big tiles win (0.72 ms vs 1.02 at
    tb=512, r3); at 2^20 nodes the dead-lane VPU work dominates and the
    HYBRID split wins — only tiles holding >= rest_thresh edges (one
    tile of score math vs their edges on the in-kernel chunk path) stay
    dense, the rest ride [tb, K] chunk steps spliced into the same
    kernel (gat_attention_agg_hybrid). ``rest_thresh`` None = full
    cover. Packed tb=1024 is a real candidate with its measured ~7%
    unpack penalty, not just the over-budget fallback; int8 candidates
    must fit _FLASH_TILE_BUDGET (packed: 1/8 of it)."""
    if n <= 8192:
        return 256, False, None
    r = np.asarray(A.rows[: A.nnz]).astype(np.int64)
    c = np.asarray(A.cols[: A.nnz]).astype(np.int64)
    K = _FLASH_CHUNK_K
    # training (default) prices fwd + the two backward tile passes; the
    # hybrid's remainder gradient additionally rides the edge path
    passes = _FLASH_TRAIN_PASSES if train else 1.0
    best = None  # (est, tb, packed, thresh)
    for tb in (256, 512, 1024):
        keys = (r // tb) << 32 | (c // tb)
        uniq, counts = np.unique(keys, return_counts=True)
        T = len(uniq)
        runs_full = len(np.unique(uniq >> 32))
        for packed in ((False, True) if tb == 1024 else (False,)):
            tile_bytes = tb * tb / (8.0 if packed else 1.0)
            tc = _flash_tile_s(tb, packed)
            if T * tile_bytes <= _FLASH_TILE_BUDGET:
                est = passes * (T * tc + runs_full * _flash_run_s(tb))
                if best is None or est < best[0]:
                    best = (est, tb, packed, None)
            if not hybrid:
                continue
            # hybrid split at this tile size: evaluate a threshold
            # ladder and price each split honestly — chunk price flips
            # from resident to streamed when the payload outgrows the
            # VMEM budget, so the optimum is not a closed form.
            # Uncovered row/col blocks add one zero cover tile each
            # (every output row block and dWh column block must be
            # written by some tile); every row block's rest rounds up
            # to whole K-slot chunks; every run pays the measured
            # output-block drain.
            n_rt = -(-A.n_rows // tb)
            n_ct = -(-A.n_cols // tb)
            for thresh in (2, 8, 32, 96, 256, 768, 1536, 3072):
                dense = counts >= thresh
                T_d = int(dense.sum())
                if T_d == 0:
                    continue
                rest_by_rb = np.bincount(
                    (uniq >> 32)[~dense].astype(np.int64),
                    weights=counts[~dense].astype(np.float64),
                )
                n_chunks = int(np.ceil(rest_by_rb / K).sum())
                cc = _flash_chunk_s(tb, n_chunks)
                runs_d = len(np.unique((uniq >> 32)[dense]))
                cover = (n_rt - runs_d) + (
                    n_ct - len(np.unique((uniq & 0xFFFFFFFF)[dense]))
                )
                e_rest = int(counts[~dense].sum())
                est_h = (
                    passes * (
                        (T_d + cover) * tc + n_rt * _flash_run_s(tb)
                    )
                    + n_chunks * cc
                    + _FLASH_HYBRID_FIXED_S
                    + (
                        e_rest * _FLASH_EDGE_BWD_S + _FLASH_BWD_FIXED_S
                        if train else 0.0
                    )
                )
                if (T_d + cover) * tile_bytes <= _FLASH_TILE_BUDGET and (
                    best is None or est_h < best[0]
                ):
                    best = (est_h, tb, packed, thresh)
    if best is None:
        return 1024, True, None  # nothing fits as int8: packed capacity
    return best[1], best[2], best[3]


def _drop_zero_val_edges(M: SparseMatrix) -> SparseMatrix:
    """Host-side filter of zero-valued edges (e.g. fill=0 self-loops).

    The rank-1 hybrid remainder scatters edges in MASK space with unit
    values (_bsr_agg_scaled), mirroring rank1_factor's exemption of
    zero-valued edges from the factorization — a zero-valued edge left in
    ``rest`` would be wrongly aggregated as 1, so it is dropped here at
    prepare time (its true contribution to ``A @ H`` is zero)."""
    v = np.asarray(M.vals[: M.nnz])
    keep = v != 0
    if keep.all():
        return M
    r = np.asarray(M.rows[: M.nnz])[keep]
    c = np.asarray(M.cols[: M.nnz])[keep]
    return SparseMatrix.from_coo(r, c, v[keep], (M.n_rows, M.n_cols))


def prepare_adjacency(
    A: SparseMatrix,
    *,
    method: str = "auto",
    dense_max_bytes: int = DENSE_MAX_BYTES,
    dense_dtype=jnp.bfloat16,
    rb: int = 1024,
    cb: int = 1024,
    be: int = 1024,
    tb: int | None = None,
    for_gat: bool = False,
    rank1: bool = True,
    rank1_factors=None,
    build_transpose: bool = True,
    fuse: bool = True,
    gat_train: bool = True,
) -> PreparedAdjacency:
    """Choose and precompute the aggregation backend for a graph.

    ``auto`` picks the backend (and BSR tile size) by a measured cost model
    over the actual tile population of this graph — RCM-reorder the graph
    first (graph/reorder.py) to unlock the block-sparse paths.

    ``for_gat`` additionally attaches the flash-attention layout (mask
    tiles, and at scale the hybrid tile/chunk split) even when the
    chosen GCN aggregation backend is not ``bsr``, so GATConv's fused
    flash path engages. ``gat_train`` (default True) makes the layout
    chooser price forward AND backward; inference-only consumers can
    pass False — at pubmed scale that flips to a hybrid split whose
    forward is ~20% faster but whose edge-path gradient would cost more
    than it saves in training.

    ``rank1`` (default on) detects a diagonal factorization of the edge
    values (sym-normalized unweighted adjacencies have one —
    graph/normalize.rank1_factor) and, when found, stores the bsr/hybrid
    tiles as exact int8 {0,1} masks with the two diagonal scalings applied
    around the tile matmuls — half the tile HBM bytes of bf16 values and
    no value-rounding error. Disable for layers that fake-quantize the
    adjacency in-jit (map_adjacency_vals cannot remap mask tiles).

    ``build_transpose=False`` skips the transposed tile plan (bsr/hybrid)
    that only the backward pass reads — halves tile HBM for inference-only
    use (at 2^22 nodes the two packed plans are ~2.4 GB; the r3 scale
    sweep needs the headroom). Gradients through such a prep raise.

    PRECISION NOTE: bsr/hybrid preps carry fused one-pass schedules
    (ops/fused_agg) that agg_matmul prefers; the fused kernel writes its
    output (and grad_H) back in BFLOAT16 — halving output DMA is part of
    its speed — before the cast back to H.dtype. f32-feature consumers
    who need full f32 accumulation on forward AND backward should pass
    ``fuse=False``: the prep then runs the tile+rest composition
    (_bsr_agg_scaled), which returns f32 accumulations at ~1-3 extra HBM
    passes per aggregation.
    """
    from sgracex1_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()  # device builds/kernels compile once per machine
    n = max(A.n_rows, A.n_cols)
    fac = None
    if method in ("auto", "hybrid", "bsr"):
        if rank1_factors is not None:
            # caller-supplied (s_row, s_col) — e.g. the distributed builder
            # slicing a verified GLOBAL factorization per shard; skips
            # detection (the caller vouches for v(r,c) = s_row[r]*s_col[c]
            # on every positive edge)
            fac = (
                np.asarray(rank1_factors[0], np.float32),
                np.asarray(rank1_factors[1], np.float32),
            )
        elif rank1:
            from sgracex1_tpu.graph.normalize import rank1_factor

            fac = rank1_factor(A)
    hybrid_split = None
    if method in ("auto", "hybrid"):
        costs, best_tb, best_hy = _estimate_backend_costs(
            A, dense_dtype, rank1=fac is not None
        )
        if method == "hybrid":
            # an explicit tb overrides the cost model's tile-size choice
            # (threshold still derived from the per-tile cost at that tb)
            hybrid_split = None if tb is not None else best_hy
        else:
            if n * n * jnp.dtype(dense_dtype).itemsize > dense_max_bytes:
                costs.pop("dense")
            method = min(costs, key=costs.get)
            if method == "bsr" and tb is None:
                tb = best_tb
            if method == "hybrid":
                hybrid_split = best_hy
    if tb is None:
        tb = 256

    def _finish(prep: PreparedAdjacency) -> PreparedAdjacency:
        if for_gat and prep.flash_tiles is None:
            from sgracex1_tpu.ops.bsr import (
                bsr_bitmask_from_sparse,
                bsr_mask_from_sparse,
            )

            gat_tb, use_packed, gat_thresh = _choose_flash_plan(
                A, n, train=gat_train
            )
            build = (
                bsr_bitmask_from_sparse if use_packed
                else bsr_mask_from_sparse
            )
            if gat_thresh is not None:
                # hybrid attention split: dense tiles cover every row AND
                # column block (flash output / dWh blocks must all be
                # written); the remainder rides in-kernel chunk steps
                # via a value-mode fused schedule. GAT masks on val > 0,
                # so zero-valued remainder edges (fill=0 loops) are
                # non-edges and are dropped from the chunks.
                part, grest = split_by_tile_density(A, gat_tb, gat_thresh)
                grest = _drop_zero_val_edges(grest)
                if part.nnz and grest.nnz:
                    from sgracex1_tpu.ops.bsr import bsr_tile_keys
                    from sgracex1_tpu.ops.fused_agg import (
                        build_fused_plan,
                    )

                    tiles = jax.device_put(build(
                        part, tb=gat_tb, cover_rows=True, cover_cols=True
                    ))
                    plan = build_fused_plan(
                        tiles, grest, K=_FLASH_CHUNK_K,
                        tile_keys=bsr_tile_keys(
                            part, gat_tb, cover_rows=True,
                            cover_cols=True,
                        ),
                        # chunks ride tile steps: a standalone chunk
                        # step pays ~2-6 us of exposed small-DMA
                        # latency (r5 diag); attached, the DMA hides
                        # behind the tile's score math
                        attach_chunks=True,
                    )
                    return dataclasses.replace(
                        prep,
                        gat_bsr=tiles,
                        gat_rest=jax.device_put(grest),
                        gat_plan=plan,
                    )
            tiles = build(A, tb=gat_tb)
            return dataclasses.replace(
                prep, gat_bsr=jax.device_put(tiles)
            )
        return prep

    def _tiles_pair(
        M: SparseMatrix, tile_tb: int
    ) -> tuple[BSRMatrix, BSRMatrix | None]:
        """(forward, transposed) tile plans: value tiles, int8 mask tiles
        when rank-1-factored, 1-bit packed masks when additionally
        lane-aligned (8x fewer tile bytes — decisive when the aggregation
        is HBM-bound). Packed tiles cannot be element-transposed, so the
        transposed plan is built from the transposed edge list. The
        transposed plan is skipped under ``build_transpose=False``."""
        if fac is not None:
            from sgracex1_tpu.ops.bsr import (
                bsr_bitmask_from_sparse,
                bsr_mask_from_sparse,
            )

            if _tile_itemsize(tile_tb, True, 1) < 1:
                B = bsr_bitmask_from_sparse(
                    M, tb=tile_tb, cover_rows=True, cover_cols=True
                )
                if not build_transpose:
                    return jax.device_put(B), None
                Bt = bsr_bitmask_from_sparse(
                    M.transpose(), tb=tile_tb, cover_rows=True,
                    cover_cols=True,
                )
                return jax.device_put(B), jax.device_put(Bt)
            B = bsr_mask_from_sparse(
                M, tb=tile_tb, cover_rows=True, cover_cols=True
            )
        else:
            B = bsr_from_sparse(
                M, tb=tile_tb, dtype=dense_dtype, cover_rows=True,
                cover_cols=True,
            )
        B = jax.device_put(B)
        return B, (bsr_transpose(B) if build_transpose else None)

    def _r1_fields() -> dict:
        if fac is None:
            return {}
        return dict(
            r1_row=jax.device_put(fac[0]), r1_col=jax.device_put(fac[1])
        )

    def _fused_pair(B, Bt, src: SparseMatrix, rest_m):
        """Fused fwd/bwd schedules (ops/fused_agg): remainder chunks and
        rank-1 scalings ride the tile kernel itself. ``src`` is the host
        edge list the tiles were built from — the tile layout is
        recomputed host-side (bsr_tile_keys) instead of pulling the
        device tile_rb/tile_cb back through the relay."""
        if not fuse:
            return None, None
        from sgracex1_tpu.ops.bsr import bsr_tile_keys
        from sgracex1_tpu.ops.fused_agg import build_fused_plan

        r1r = fac[0] if fac is not None else None
        r1c = fac[1] if fac is not None else None
        # attach_chunks: chunks ride their block's tile steps (measured
        # 7.94 -> 7.23 ms / 706 M edges/s at 2^20, exact parity — the
        # standalone chunk steps' exposed latency disappears)
        fused = build_fused_plan(
            B, rest_m, r1_row=r1r, r1_col=r1c,
            tile_keys=bsr_tile_keys(
                src, B.tb, cover_rows=True, cover_cols=True
            ),
            attach_chunks=True,
        )
        fused_t = (
            build_fused_plan(
                Bt,
                rest_m.transpose() if rest_m is not None else None,
                r1_row=r1c,
                r1_col=r1r,
                tile_keys=bsr_tile_keys(
                    src.transpose(), Bt.tb, cover_rows=True, cover_cols=True
                ),
                attach_chunks=True,
            )
            if Bt is not None
            else None
        )
        return fused, fused_t

    if method == "hybrid":
        h_tb, h_thresh = hybrid_split or (
            tb,
            int(
                np.ceil(
                    _tile_cost_s(
                        tb,
                        _tile_itemsize(
                            tb, fac is not None,
                            jnp.dtype(dense_dtype).itemsize,
                        ),
                    )
                    / (_REST_SLOT_S + _REST_CHUNK_S / _REST_K)
                )
            ),
        )
        part, rest = split_by_tile_density(A, h_tb, h_thresh)
        if fac is not None and rest.nnz:
            rest = _drop_zero_val_edges(rest)
        B, Bt = _tiles_pair(part, h_tb)
        fused, fused_t = _fused_pair(
            B, Bt, part, rest if rest.nnz else None
        )
        return _finish(PreparedAdjacency(
            A=A,
            dense=None,
            plan=None,
            plan_t=None,
            bsr=B,
            bsr_t=Bt,
            rest=jax.device_put(rest) if rest.nnz else None,
            fused=fused,
            fused_t=fused_t,
            kind="hybrid",
            **_r1_fields(),
        ))
    if method == "bsr":
        B, Bt = _tiles_pair(A, tb)
        fused, fused_t = _fused_pair(B, Bt, A, None)
        return _finish(PreparedAdjacency(
            A=A,
            dense=None,
            plan=None,
            plan_t=None,
            bsr=B,
            bsr_t=Bt,
            fused=fused,
            fused_t=fused_t,
            kind="bsr",
            **_r1_fields(),
        ))
    if method == "dense":
        d = A.to_dense().astype(np.float32)  # host build — no device scatter
        dense = chunked_device_put(d.astype(dense_dtype))
        return _finish(PreparedAdjacency(
            A=A, dense=dense, plan=None, plan_t=None, kind="dense"
        ))
    if method == "pallas":
        plan = jax.device_put(plan_spmm(A, rb=rb, cb=cb, be=be))
        plan_t = jax.device_put(plan_spmm(A.transpose(), rb=rb, cb=cb, be=be))
        return _finish(PreparedAdjacency(
            A=A, dense=None, plan=plan, plan_t=plan_t, kind="pallas"
        ))
    if method == "xla":
        return _finish(PreparedAdjacency(
            A=A, dense=None, plan=None, plan_t=None, kind="xla"
        ))
    raise ValueError(f"unknown method {method!r}")


def prepare_from_config(
    A: SparseMatrix, cfg, *, for_gat: bool = False, method: str | None = None
) -> PreparedAdjacency:
    """prepare_adjacency driven by SGRACEConfig's kernel-tiling tier
    (row_block/col_block/edge_block = the reference's compile-time
    B_WIDTH_BLOCK / SPMM_BLOCK knobs; use_pallas forces the Pallas path).

    ``for_gat`` attaches the flash-attention mask tiles (GAT models);
    ``method`` overrides the backend choice (default: cost-model auto,
    or pallas when cfg.use_pallas)."""
    be = max(cfg.edge_block, 1024)
    be = ((be + 1023) // 1024) * 1024  # plan requires multiples of 1024
    return prepare_adjacency(
        A,
        method=method or ("pallas" if cfg.use_pallas else "auto"),
        rb=max(cfg.row_block, 8),
        cb=max(cfg.col_block, 128),
        be=be,
        for_gat=for_gat,
        # QAT layers fake-quantize adjacency values in-jit, which mask
        # tiles cannot represent (map_adjacency_vals)
        rank1=not cfg.fake_quantization,
    )


def agg_matmul(prep: PreparedAdjacency, H: jax.Array) -> jax.Array:
    """out = A @ H via the prepared backend (differentiable).

    Output dtype is H.dtype, but on fused-schedule preps (bsr/hybrid
    default) the values round through BFLOAT16 on forward and grad_H —
    see prepare_adjacency's precision note (``fuse=False`` opts out)."""
    if prep.kind == "dense":
        out = jnp.dot(
            prep.dense,
            H.astype(prep.dense.dtype),
            preferred_element_type=jnp.float32,
        )
        return out[: prep.A.n_rows].astype(H.dtype)
    if prep.kind == "pallas":
        return _pallas_agg(prep.plan, prep.plan_t, H).astype(H.dtype)
    if prep.kind == "bsr":
        if prep.fused is not None:
            return _fused_agg(prep.fused, prep.fused_t, H).astype(H.dtype)
        return _bsr_agg_scaled(prep, H).astype(H.dtype)
    if prep.kind == "hybrid":
        if prep.fused is not None:
            return _fused_agg(prep.fused, prep.fused_t, H).astype(H.dtype)
        out = _bsr_agg_scaled(prep, H, rest=prep.rest)
        return out.astype(H.dtype)
    return spmm(prep.A, H)


def _bsr_agg_scaled(
    prep: PreparedAdjacency, H: jax.Array, rest: SparseMatrix | None = None
) -> jax.Array:
    """Tile aggregation, with the rank-1 diagonal scalings applied around
    the mask-tile matmul when present: A @ H == r1_row * (M @ (r1_col * H)).
    The scalings are plain jnp ops OUTSIDE the custom-VJP kernel, so
    autodiff applies the product rule natively and the backward stays on
    the transposed tile kernel.

    ``rest`` (the hybrid backend's remainder edges) is scatter-added in
    mask space, BEFORE the row scaling: every edge value factors exactly as
    r1_row[r] * r1_col[c] (rank1_factor verifies the factorization or the
    prep falls back to value tiles), so the M-space edge values are exactly
    1 and the scatter adds the column-scaled features directly into the
    tile kernel's accumulator. Measured ~1 ms cheaper at the 1M-node scale
    than scattering after the row scaling (r3 diag V2): the scatter operand
    is the raw kernel output, which XLA updates in place."""
    if prep.r1_row is None:
        out = _bsr_agg(prep.bsr, prep.bsr_t, H)
        if rest is not None:
            out = spmm_into(rest, H, out)
        return out
    # scale in H's dtype: upcasting to f32 here would materialize a full
    # f32 copy the kernel immediately casts back to bf16, doubling the
    # pre-kernel HBM traffic ({0,1} tiles make bf16 rounding equivalent
    # to the value-tile path)
    Hs = H * prep.r1_col[: H.shape[0], None].astype(H.dtype)
    out = _bsr_agg(prep.bsr, prep.bsr_t, Hs)
    if rest is not None:
        # static-slice away the edge padding: padded entries carry val 0,
        # which the unit-value mask-space scatter cannot rely on
        r = rest.rows[: rest.nnz]
        c = rest.cols[: rest.nnz]
        out = out.at[r].add(
            jnp.take(Hs, c, axis=0).astype(out.dtype),
            indices_are_sorted=rest.rows_sorted,
        )
    return out * prep.r1_row[: out.shape[0], None]


@jax.custom_vjp
def _fused_agg(plan, plan_t, H: jax.Array) -> jax.Array:
    """Differentiable fused aggregation (ops/fused_agg.bsr_spmm_fused):
    forward on the fwd schedule, grad_H = A^T @ g on the transposed
    schedule — both single kernel passes; plans get None cotangents."""
    from sgracex1_tpu.ops.fused_agg import bsr_spmm_fused

    return bsr_spmm_fused(plan, H)


def _fused_agg_fwd(plan, plan_t, H):
    from sgracex1_tpu.ops.fused_agg import bsr_spmm_fused

    # zero-size token carries H's dtype (a bare np.dtype is not a pytree
    # leaf the vjp machinery accepts)
    return bsr_spmm_fused(plan, H), (
        plan_t, H.shape[0], jnp.zeros((0,), H.dtype)
    )


def _fused_agg_bwd(res, g):
    plan_t, n_h, h_tok = res
    h_dtype = h_tok.dtype
    if plan_t is None:
        raise ValueError(
            "backward through a prep built with build_transpose=False — "
            "re-prepare with build_transpose=True for training"
        )
    from sgracex1_tpu.ops.fused_agg import bsr_spmm_fused

    gH = bsr_spmm_fused(plan_t, g).astype(h_dtype)
    if gH.shape[0] < n_h:
        gH = jnp.pad(gH, ((0, n_h - gH.shape[0]), (0, 0)))
    return None, None, gH[:n_h]


_fused_agg.defvjp(_fused_agg_fwd, _fused_agg_bwd)


@jax.custom_vjp
def _pallas_agg(plan: SpMMPlan, plan_t: SpMMPlan, H: jax.Array) -> jax.Array:
    return spmm_pallas(plan, H)


def _pallas_agg_fwd(plan, plan_t, H):
    return spmm_pallas(plan, H), (
        plan, plan_t, H.shape[0], jnp.zeros((0,), H.dtype)
    )


def _pallas_agg_bwd(res, g):
    # grad_H = A^T @ g via the pre-built transpose schedule
    plan, plan_t, n_h, h_tok = res
    gH = spmm_pallas(plan_t, g).astype(h_tok.dtype)
    if gH.shape[0] < n_h:
        gH = jnp.pad(gH, ((0, n_h - gH.shape[0]), (0, 0)))
    return None, None, gH[:n_h]


_pallas_agg.defvjp(_pallas_agg_fwd, _pallas_agg_bwd)


@jax.custom_vjp
def _bsr_agg(B, B_t, H):
    return bsr_spmm_pallas(B, H)


def _bsr_agg_fwd(B, B_t, H):
    return bsr_spmm_pallas(B, H), (
        B_t, H.shape[0], jnp.zeros((0,), H.dtype)
    )


def _bsr_agg_bwd(res, g):
    B_t, n_h, h_tok = res
    if B_t is None:
        raise ValueError(
            "backward through a prep built with build_transpose=False — "
            "re-prepare with build_transpose=True for training"
        )
    # cast to the primal dtype: the kernel accumulates f32 while H may be
    # bf16 (cotangent dtype must match the primal's)
    gH = bsr_spmm_pallas(B_t, g).astype(h_tok.dtype)
    if gH.shape[0] < n_h:
        gH = jnp.pad(gH, ((0, n_h - gH.shape[0]), (0, 0)))
    return None, None, gH[:n_h]


_bsr_agg.defvjp(_bsr_agg_fwd, _bsr_agg_bwd)


def agg_matmul_with_vals(
    prep: PreparedAdjacency, vals: jax.Array, H: jax.Array
) -> jax.Array:
    """out = A(vals) @ H with runtime edge values (attention weights) in the
    original edge order. Differentiable in both vals and H.

    Backend note: only the pallas plan substitutes values for free (the
    plan stores per-edge values in its group layout — a permutation). For
    bsr/hybrid/dense, rebuilding value TILES per call would write+read the
    whole tile set every invocation (T*tb*tb*4 bytes — e.g. ~9 GB/call for
    the 1M-node hybrid plan), strictly worse than the ~12 ns/edge gather
    path, so those backends take the edge path. Attention aggregation on
    tile backends should use the fused flash kernel
    (ops/flash_gat.gat_attention_agg_fused) instead, which never needs
    value substitution — GATConv does this automatically via flash_tiles.
    """
    if prep.kind == "pallas":
        return _pallas_agg_vals(prep.A, prep.plan, prep.plan_t, vals, H).astype(
            H.dtype
        )
    return spmm(prep.A.with_vals(vals), H)


def _pallas_agg_vals_impl(A, plan, plan_t, vals, H):
    return spmm_pallas(plan_with_vals(plan, vals), H)


@jax.custom_vjp
def _pallas_agg_vals(A, plan, plan_t, vals, H):
    return _pallas_agg_vals_impl(A, plan, plan_t, vals, H)


def _pallas_agg_vals_fwd(A, plan, plan_t, vals, H):
    return _pallas_agg_vals_impl(A, plan, plan_t, vals, H), (
        A,
        plan_t,
        vals,
        H,
    )


def _pallas_agg_vals_bwd(res, g):
    A, plan_t, vals, H = res
    # grad_H = A(vals)^T @ g
    gH = spmm_pallas(plan_with_vals(plan_t, vals), g)
    if gH.shape[0] < H.shape[0]:
        gH = jnp.pad(gH, ((0, H.shape[0] - gH.shape[0]), (0, 0)))
    # grad_vals[e] = g[row_e] . H[col_e]  (SDDMM of the cotangent)
    gv = jnp.sum(
        jnp.take(g, A.rows, axis=0) * jnp.take(H, A.cols, axis=0), axis=1
    ).astype(vals.dtype)
    return None, None, None, gv, gH[: H.shape[0]]


_pallas_agg_vals.defvjp(_pallas_agg_vals_fwd, _pallas_agg_vals_bwd)


def map_adjacency_vals(prep: PreparedAdjacency, fn) -> PreparedAdjacency:
    """Apply an elementwise function to the adjacency values of every
    backend representation (used for fake-quantizing the adjacency; fn must
    map 0 -> 0 so dense zeros and padding stay zero)."""
    if prep.r1_row is not None:
        # remapped values break the rank-1 factorization (tiles hold {0,1},
        # not values) — degrade to the always-correct edge path instead of
        # erroring at trace time. gat_bsr mask tiles survive (any 0 -> 0
        # quantizer keeps the tile > 0 semantics), so flash attention still
        # engages. Re-prepare with rank1=False to keep tile aggregation.
        import warnings

        warnings.warn(
            "map_adjacency_vals on a rank-1 mask-tile backend: remapped "
            "values cannot live in {0,1} tiles, so plain aggregation falls "
            "back to the edge path for this layer. Prepare the adjacency "
            "with prepare_adjacency(..., rank1=False) (or "
            "prepare_from_config, which does this for fake_quantization "
            "configs) to keep the MXU tile kernels.",
            stacklevel=2,
        )
        return dataclasses.replace(
            prep,
            A=prep.A.with_vals(fn(prep.A.vals)),
            dense=None, plan=None, plan_t=None, bsr=None, bsr_t=None,
            rest=None, r1_row=None, r1_col=None, fused=None, fused_t=None,
            kind="xla",
        )
    A = prep.A.with_vals(fn(prep.A.vals))
    dense = fn(prep.dense) if prep.dense is not None else None
    plan = (
        dataclasses.replace(prep.plan, val=fn(prep.plan.val))
        if prep.plan is not None
        else None
    )
    plan_t = (
        dataclasses.replace(prep.plan_t, val=fn(prep.plan_t.val))
        if prep.plan_t is not None
        else None
    )
    bsr = (
        dataclasses.replace(prep.bsr, tiles=fn(prep.bsr.tiles))
        if prep.bsr is not None
        else None
    )
    bsr_t = (
        dataclasses.replace(prep.bsr_t, tiles=fn(prep.bsr_t.tiles))
        if prep.bsr_t is not None
        else None
    )
    rest = prep.rest.with_vals(fn(prep.rest.vals)) if prep.rest is not None else None
    # gat_bsr holds 0/1 MASK tiles: any 0 -> 0 quantizer leaves the mask
    # semantics (tile > 0) unchanged, so it is deliberately not remapped.
    # The fused schedules embed tile values AND remainder slot scales —
    # dropping them falls back to the bsr/rest composition, whose pieces
    # are all remapped above.
    return dataclasses.replace(
        prep, A=A, dense=dense, plan=plan, plan_t=plan_t, bsr=bsr,
        bsr_t=bsr_t, rest=rest, fused=None, fused_t=None,
    )
