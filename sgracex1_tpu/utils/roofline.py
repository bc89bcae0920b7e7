"""Roofline attribution: how far each kernel sits from chip peaks.

TPU-native replacement for the reference's in-fabric FIFO stall counters
(``kernelMatrixmult_all.cpp:1018-1291``, dumped at ``:3948-3962`` and decoded
in ``jupyter/test/mmult-master.ipynb`` cells 39-40 into statements like
"frontend fast/slow"). On TPU we cannot count pipeline stalls, but we can do
better: model each backend's ideal HBM bytes, MXU FLOPs, and VPU
elementwise/transcendental ops per invocation, divide by the measured time,
and report the achieved fraction of the chip's peak for each — whichever
fraction is highest is the resource the kernel is bound by, and its
distance from 100% is the remaining headroom ("% of speed-of-light").

Peaks default to TPU v5e (the chip behind this environment's relay):
~197 TFLOP/s bf16 on the MXU, ~819 GB/s HBM. The VPU peaks are MEASURED on
this environment's chip (benchmarks/bench_vpu_cal.py, 2026-08-20, with the
fori-loop overhead subtracted via multi-length op chains): simple f32
elementwise ops sustain ~5.5 T op/s and ``exp`` ~0.49 T/s (~11 ALU slots).
The VPU axis is what the flash-GAT kernel — whose per-tile work is mostly
score elementwise math — is actually bound by; without it the HBM/MXU-only
roofline misreported the kernel at "22% of HBM roof" (BENCH_r02) as if 4x
headroom existed. With these peaks the r3 sweep's best pubmed flash config
(tb=1024, 0.721 ms) models to 93% of the VPU roof.
"""

from __future__ import annotations

import dataclasses

# TPU v5e published peaks (per chip)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9
# measured on the attached v5e via benchmarks/bench_vpu_cal.py (see module
# docstring); update there first if the relay hardware ever changes
V5E_PEAK_VPU_OPS = 5.5e12  # simple f32 elementwise ops / s
V5E_PEAK_TRANSC = 4.9e11  # f32 exp / s


@dataclasses.dataclass(frozen=True)
class CostModel:
    """Ideal per-invocation resource footprint of one kernel call.

    ``vpu_ops`` counts simple elementwise vector ops (add/mul/select/
    compare/max, one per element per op); ``transcendentals`` counts
    exp/log-class ops, which cost several ALU slots each. Both execute on
    the same 8x128 vector unit, so the VPU axis is their combined time.
    """

    flops: float
    hbm_bytes: float
    note: str = ""
    vpu_ops: float = 0.0
    transcendentals: float = 0.0

    def __add__(self, other: "CostModel") -> "CostModel":
        return CostModel(
            self.flops + other.flops,
            self.hbm_bytes + other.hbm_bytes,
            "+".join(n for n in (self.note, other.note) if n),
            self.vpu_ops + other.vpu_ops,
            self.transcendentals + other.transcendentals,
        )

    def roofline(
        self,
        sec: float,
        *,
        peak_flops: float = V5E_PEAK_BF16_FLOPS,
        peak_bytes: float = V5E_PEAK_HBM_BYTES,
        peak_vpu: float = V5E_PEAK_VPU_OPS,
        peak_transc: float = V5E_PEAK_TRANSC,
    ) -> dict:
        """Achieved rates and % of peak; ``bound`` names the resource whose
        utilization is highest (the one the kernel is limited by if the cost
        model is right)."""
        tflops = self.flops / sec / 1e12
        gbs = self.hbm_bytes / sec / 1e9
        pct_mxu = 100.0 * self.flops / sec / peak_flops
        pct_hbm = 100.0 * self.hbm_bytes / sec / peak_bytes
        # elementwise and transcendental work share the vector unit, so the
        # VPU utilization is the sum of their ideal times over the wall time
        vpu_sec = self.vpu_ops / peak_vpu + self.transcendentals / peak_transc
        pct_vpu = 100.0 * vpu_sec / sec
        pcts = {"HBM": pct_hbm, "MXU": pct_mxu, "VPU": pct_vpu}
        bound = max(pcts, key=pcts.get)
        # Serial-mix speed-of-light: DMA double-buffers against compute, but
        # VPU and MXU work in one kernel step are data-dependent (e.g. the
        # packed-tile unpack feeds the tile matmul), so the achievable floor
        # is max(HBM time, VPU time + MXU time). ``pct_sol`` is the fraction
        # of that floor actually achieved — the honest "how far from
        # speed-of-light" number for kernels where no single resource
        # dominates (max-single-resource attribution under-reports those).
        # Can slightly exceed 100 when the units overlap better than the
        # serial model assumes (or the measured peaks are conservative).
        mxu_sec = self.flops / peak_flops
        hbm_sec = self.hbm_bytes / peak_bytes
        sol_sec = max(hbm_sec, vpu_sec + mxu_sec)
        comp = vpu_sec + mxu_sec
        if hbm_sec >= comp:
            sol_bound = "HBM"
        elif min(vpu_sec, mxu_sec) > 0.25 * comp:
            sol_bound = "VPU+MXU"
        else:
            sol_bound = "VPU" if vpu_sec > mxu_sec else "MXU"
        return dict(
            tflops=round(tflops, 2),
            gb_s=round(gbs, 1),
            pct_mxu=round(pct_mxu, 1),
            pct_hbm=round(pct_hbm, 1),
            pct_vpu=round(pct_vpu, 1),
            bound=bound,
            pct_roofline=round(pcts[bound], 1),
            pct_sol=round(100.0 * sol_sec / sec, 1) if sec > 0 else 0.0,
            sol_bound=sol_bound,
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


def cost_bsr(B, P: int, out_itemsize: int = 4) -> CostModel:
    """BSR tile kernel (ops/bsr.py): per nonempty tile, one tb x tb x P
    matmul; tile + H block read, output written once per row block
    (accumulator revisits stay in VMEM). 1-bit packed tiles additionally
    pay ~4 VPU ops/element to unpack (shift+and per plane + concat+cast).
    ``out_itemsize`` is 2 for the fused kernel's bf16 output blocks."""
    tb = B.tb
    T = B.num_tiles
    packed = B.tiles.shape[-1] != tb
    itemsize = B.tiles.dtype.itemsize * (
        1 if not packed else B.tiles.shape[-1] / tb
    )
    return CostModel(
        flops=2.0 * T * tb * tb * P,
        hbm_bytes=float(
            T * (tb * tb * itemsize + tb * P * 2)
            + B.n_row_tiles * tb * P * out_itemsize
        ),
        note="bsr",
        vpu_ops=4.0 * T * tb * tb if packed else 0.0,
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


# elementwise VPU ops per adjacency-tile element in the flash-GAT forward:
# mask cast+test (2), score outer-add (1), LeakyReLU as mul+max (2),
# mask apply (1), running row-max (1), subtract m (1) — the exp is counted
# separately as a transcendental, and the row softmax denominator rides the
# MXU matmul (ones column appended to Wh), not the VPU
FLASH_GAT_VPU_OPS_PER_ELT = 8


def cost_flash_gat(
    B, F: int, H: int = 1, n_chunks: int = 0, K: int = 128
) -> CostModel:
    """Flash GAT forward (ops/flash_gat.py): per tile per head, the score
    elementwise math (VPU) + one exp per element (transcendental) + one
    tb x tb x F MXU matmul; tiles re-read per head, stats/outputs written
    once per row block. ``n_chunks`` adds the hybrid remainder chunk
    steps ([tb, K] score grids + one-hot MXU; payloads VMEM-resident)."""
    tb = B.tb
    T = B.num_tiles
    itemsize = B.tiles.dtype.itemsize * (
        1 if B.tiles.shape[-1] == tb else B.tiles.shape[-1] / tb
    )
    elems = float(H * (T * tb * tb + n_chunks * tb * K))
    return CostModel(
        flops=2.0 * H * (T * tb * tb + n_chunks * tb * K) * (F + 4),
        hbm_bytes=float(
            H * T * (tb * tb * itemsize + tb * F * 2 + 2 * tb * 4)
            + H * n_chunks * K * (F + 1) * 4
            + H * B.n_row_tiles * tb * (F + 2) * 4
        ),
        note="flash-gat",
        vpu_ops=FLASH_GAT_VPU_OPS_PER_ELT * elems,
        transcendentals=elems,
    )


# elementwise VPU ops per tile element in ONE backward pass's probability
# recompute (_tile_probs with saved m/l: outer-add, LeakyReLU mul+max, mask
# apply, subtract m, divide by l — no running max) plus that pass's own
# elementwise work (row pass: pq, pq*lr, p*lr + three row reductions; col
# pass: dE = p*(q-t)*lr). exp counted separately as a transcendental.
FLASH_BWD_VPU_OPS_ROW_PASS = 7 + 6
FLASH_BWD_VPU_OPS_COL_PASS = 7 + 3


def cost_flash_gat_bwd(B, F: int, H: int = 1) -> CostModel:
    """Fused flash-GAT backward (ops/flash_gat.flash_gat_backward): two
    tile-streaming passes (row-sorted then column-sorted), each recomputing
    tile probabilities (one exp/element) and paying one tb x tb x F MXU
    matmul for the cotangent SDDMM ``q = gO @ Wh^T``; the column pass adds
    the ``dWh = p^T @ gO`` matmul. Tiles, score/stat vectors, and the
    Wh/gO blocks stream per tile in each pass."""
    tb = B.tb
    T = B.num_tiles
    itemsize = B.tiles.dtype.itemsize * (
        1 if B.tiles.shape[-1] == tb else B.tiles.shape[-1] / tb
    )
    elems = float(H * T * tb * tb)
    vpu = (FLASH_BWD_VPU_OPS_ROW_PASS + FLASH_BWD_VPU_OPS_COL_PASS) * elems
    return CostModel(
        # q in both passes + dWh in the col pass = 3 tile matmuls, plus the
        # ds2 colsum matvec (2 flops/elt)
        flops=3.0 * 2.0 * elems * F + 2.0 * elems,
        hbm_bytes=float(
            2 * H * T * (tb * tb * itemsize + 2 * tb * F * 2 + 4 * tb * 4)
            + H * B.n_row_tiles * tb * (F + 3) * 4
        ),
        note="flash-gat-bwd",
        vpu_ops=vpu,
        transcendentals=2.0 * elems,
    )


def cost_rank1_scaling(n_rows: int, n_cols: int, P: int) -> CostModel:
    """Diagonal scaling passes around the mask-tile matmul (dispatch's
    rank-1 path). MEASURED ~free at the 1M-node scale (r3 diagnostic:
    bare kernel 7.86 ms vs kernel+scalings 7.72 ms): the column scaling
    fuses into the H->bf16 cast pass the kernel needs anyway, and the row
    scaling fuses into the output's dtype cast. Charge only the one extra
    f32 pass over the output that the row scaling can add when the caller
    keeps f32 (conservative upper bound; the earlier 4-pass model
    overcharged the hybrid backend by ~2 GB and skewed its roofline)."""
    return CostModel(
        flops=float((n_rows + n_cols) * P),
        hbm_bytes=float(n_rows * P * 4),
        note="r1-scale",
    )


def cost_fused(prep, P: int, h_itemsize: int = 2) -> CostModel:
    """Fused tile+remainder+scaling kernel (ops/fused_agg): the tile cost
    with a bf16 output, plus per-chunk one-hot MXU matmuls and G-chunk
    DMA for the remainder, the slot gather, and the in-kernel scaling
    VPU work. ``h_itemsize`` 4 adds the f32 -> bf16 feature cast pass the
    kernel input needs when features arrive in f32."""
    f = prep.fused
    B = f.B
    tb, K, R = B.tb, f.K, f.num_chunks
    slots = R * K
    c = cost_bsr(B, P, out_itemsize=2)
    cast = float(B.n_cols * P * (h_itemsize + 2)) if h_itemsize != 2 else 0.0
    has_rest = prep.rest is not None and prep.rest.nnz
    rest = CostModel(
        # one-hot matmul per chunk + the iota/compare build
        flops=2.0 * R * tb * K * P if has_rest else 0.0,
        # G chunk + lrow reads in-kernel; gather reads one feature row and
        # writes one G row per slot
        hbm_bytes=float(
            R * (K * P * 2 + 8 * K * 4) + slots * (2 * P * 2 + 8)
        )
        if has_rest
        else 0.0,
        vpu_ops=2.0 * R * tb * K if has_rest else 0.0,
        note="fused-rest",
    )
    scale_vpu = (
        float(B.num_tiles * tb * P + B.n_row_tiles * tb * P)
        if f.colscale is not None
        else 0.0
    )
    extra = CostModel(
        flops=0.0, hbm_bytes=cast, vpu_ops=scale_vpu, note="fused-extra"
    )
    return dataclasses.replace(c + rest + extra, note=f"fused-{prep.kind}")


def cost_for_prep(prep, P: int, h_itemsize: int = 4) -> CostModel:
    """Cost model for ``agg_matmul(prep, H)`` with feature width P.
    ``h_itemsize`` is the feature dtype width (2 for bf16 features)."""
    if prep.kind == "dense":
        return cost_dense(prep.dense.shape[0], P, prep.dense.dtype.itemsize)
    if prep.kind == "pallas":
        return cost_pallas_onehot(prep.plan, P)
    if prep.kind in ("bsr", "hybrid"):
        if getattr(prep, "fused", None) is not None:
            return cost_fused(prep, P, h_itemsize)
        c = cost_bsr(prep.bsr, P)
        if prep.r1_row is not None:
            c = c + cost_rank1_scaling(prep.A.n_rows, prep.A.n_cols, P)
        if prep.kind == "hybrid" and prep.rest is not None and prep.rest.nnz:
            c = c + cost_xla_edges(prep.rest.nnz, prep.A.n_rows, P)
        return dataclasses.replace(c, note=prep.kind)
    return cost_xla_edges(prep.A.nnz, prep.A.n_rows, P)
