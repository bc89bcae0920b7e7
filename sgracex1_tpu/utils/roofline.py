"""Roofline attribution: how far each kernel sits from chip peaks.

TPU-native replacement for the reference's in-fabric FIFO stall counters
(``kernelMatrixmult_all.cpp:1018-1291``, dumped at ``:3948-3962`` and decoded
in ``jupyter/test/mmult-master.ipynb`` cells 39-40 into statements like
"frontend fast/slow"). On TPU we cannot count pipeline stalls, but we can do
better: model each backend's ideal HBM bytes and MXU FLOPs per invocation,
divide by the measured time, and report the achieved fraction of the chip's
peak for each — whichever fraction is higher is the resource the kernel is
bound by, and its distance from 100% is the remaining headroom ("% of
speed-of-light").

Peaks default to TPU v5e (the chip behind this environment's relay):
~197 TFLOP/s bf16 on the MXU, ~819 GB/s HBM.
"""

from __future__ import annotations

import dataclasses

# TPU v5e published peaks (per chip)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


@dataclasses.dataclass(frozen=True)
class CostModel:
    """Ideal per-invocation resource footprint of one kernel call."""

    flops: float
    hbm_bytes: float
    note: str = ""

    def __add__(self, other: "CostModel") -> "CostModel":
        return CostModel(
            self.flops + other.flops,
            self.hbm_bytes + other.hbm_bytes,
            "+".join(n for n in (self.note, other.note) if n),
        )

    def roofline(
        self,
        sec: float,
        *,
        peak_flops: float = V5E_PEAK_BF16_FLOPS,
        peak_bytes: float = V5E_PEAK_HBM_BYTES,
    ) -> dict:
        """Achieved rates and % of peak; ``bound`` names the resource whose
        utilization is higher (the one the kernel is limited by if the cost
        model is right)."""
        tflops = self.flops / sec / 1e12
        gbs = self.hbm_bytes / sec / 1e9
        pct_mxu = 100.0 * self.flops / sec / peak_flops
        pct_hbm = 100.0 * self.hbm_bytes / sec / peak_bytes
        return dict(
            tflops=round(tflops, 2),
            gb_s=round(gbs, 1),
            pct_mxu=round(pct_mxu, 1),
            pct_hbm=round(pct_hbm, 1),
            bound="HBM" if pct_hbm >= pct_mxu else "MXU",
            pct_roofline=round(max(pct_hbm, pct_mxu), 1),
            note=self.note,
        )

    def fmt(self, sec: float, **kw) -> str:
        r = self.roofline(sec, **kw)
        return (
            f"{r['tflops']:6.2f} TF/s {r['gb_s']:6.1f} GB/s "
            f"{r['pct_roofline']:5.1f}% of {r['bound']} roof"
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cost_dense(n_pad: int, P: int, a_itemsize: int = 2) -> CostModel:
    """Dense backend: one [n, n] @ [n, P] MXU matmul; the adjacency streams
    from HBM, H is read and the output written once."""
    return CostModel(
        flops=2.0 * n_pad * n_pad * P,
        hbm_bytes=float(n_pad * n_pad * a_itemsize + n_pad * P * 2 + n_pad * P * 4),
        note="dense",
    )


def cost_bsr(B, P: int) -> CostModel:
    """BSR tile kernel (ops/bsr.py): per nonempty tile, one tb x tb x P
    matmul; tile + H block read, output written once per row block
    (accumulator revisits stay in VMEM)."""
    tb = B.tb
    T = B.num_tiles
    itemsize = B.tiles.dtype.itemsize * (
        1 if B.tiles.shape[-1] == tb else B.tiles.shape[-1] / tb
    )
    return CostModel(
        flops=2.0 * T * tb * tb * P,
        hbm_bytes=float(
            T * (tb * tb * itemsize + tb * P * 2) + B.n_row_tiles * tb * P * 4
        ),
        note="bsr",
    )


def cost_pallas_onehot(plan, P: int) -> CostModel:
    """One-hot edge kernel (ops/pallas_spmm.py): each group pays two
    one-hot matmuls ((rb + cb) redundant MACs per edge) — enormous FLOP
    inflation is the price of gather-free scatter."""
    G = plan.num_groups
    be = plan.be
    return CostModel(
        flops=2.0 * G * be * (plan.rb + plan.cb) * P,
        hbm_bytes=float(G * (plan.cb * P * 4 + 3 * be * 4) + plan.n_rows * P * 4),
        note="pallas-onehot",
    )


def cost_xla_edges(nnz: int, n_rows: int, P: int) -> CostModel:
    """XLA take + segment_sum: per edge, 3 index/value words, a gathered
    feature row, and a scatter read-modify-write of the output row."""
    return CostModel(
        flops=2.0 * nnz * P,
        hbm_bytes=float(nnz * 12 + nnz * P * 4 + 2 * nnz * P * 4),
        note="xla-edges",
    )


def cost_flash_gat(B, F: int, H: int = 1) -> CostModel:
    """Flash GAT forward (ops/flash_gat.py): per tile per head, the score
    outer-add/exp (VPU) + one tb x tb x F MXU matmul; tiles re-read per
    head, stats/outputs written once per row block."""
    tb = B.tb
    T = B.num_tiles
    itemsize = B.tiles.dtype.itemsize * (
        1 if B.tiles.shape[-1] == tb else B.tiles.shape[-1] / tb
    )
    return CostModel(
        flops=2.0 * H * T * tb * tb * (F + 4),
        hbm_bytes=float(
            H * T * (tb * tb * itemsize + tb * F * 2 + 2 * tb * 4)
            + H * B.n_row_tiles * tb * (F + 2) * 4
        ),
        note="flash-gat",
    )


def cost_rank1_scaling(n_rows: int, n_cols: int, P: int) -> CostModel:
    """Diagonal scaling passes around the mask-tile matmul (dispatch's
    rank-1 path): H is read and the scaled copy written before the kernel,
    the output re-read and re-written after."""
    return CostModel(
        flops=float((n_rows + n_cols) * P),
        hbm_bytes=float(2 * n_cols * P * 4 + 2 * n_rows * P * 4),
        note="r1-scale",
    )


def cost_for_prep(prep, P: int) -> CostModel:
    """Cost model for ``agg_matmul(prep, H)`` with feature width P."""
    if prep.kind == "dense":
        return cost_dense(prep.dense.shape[0], P, prep.dense.dtype.itemsize)
    if prep.kind == "pallas":
        return cost_pallas_onehot(prep.plan, P)
    if prep.kind in ("bsr", "hybrid"):
        c = cost_bsr(prep.bsr, P)
        if prep.r1_row is not None:
            c = c + cost_rank1_scaling(prep.A.n_rows, prep.A.n_cols, P)
        if prep.kind == "hybrid" and prep.rest is not None and prep.rest.nnz:
            c = c + cost_xla_edges(prep.rest.nnz, prep.A.n_rows, P)
        return dataclasses.replace(c, note=prep.kind)
    return cost_xla_edges(prep.A.nnz, prep.A.n_rows, P)
