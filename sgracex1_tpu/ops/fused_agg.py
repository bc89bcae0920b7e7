"""Fully-fused block-sparse aggregation: tiles + remainder + scalings in
ONE Pallas kernel.

Re-implements the aggregation stage of the reference engine
(``kernelMatrixmult_all.cpp:2009-2048`` — one MAC per nonzero per cycle,
no DRAM round-trips between pipeline stages) for the hybrid tile split.
The r3 pipeline paid three extra HBM passes around the tile kernel at the
1M-node scale, ~3 of its 10.6 ms:

- ``Hs = H * r1_col`` materialized a scaled copy of the features;
- the remainder edges (tiles below the density threshold) went through an
  XLA scatter-add — measured ~40-53 ns per UNIQUE row (12.5 GB/s
  effective; compaction does not help, the random row write itself is the
  wall — benchmarks/diag_rest_v2.py);
- ``out * r1_row`` + the bf16 cast read and rewrote the f32 output.

This kernel folds all three into the tile grid:

- the column scaling multiplies the H block in VMEM ([tb, 1] broadcast,
  ~131k VPU ops/step);
- remainder edges ride EXTRA GRID STEPS inserted into their output row
  block's tile run: a chunk of K pre-gathered, pre-scaled feature rows
  (``G = H[col] * scale`` — gather is ~4 ns/edge, it was never the
  problem) lands in the accumulator through a one-hot matmul on the MXU,
  reusing the output block that is already resident (the XLA scatter's
  random HBM writes disappear entirely);
- the row scaling applies once per output block on the last step of its
  run, and the block is written back in bf16 (halving output DMA).

The schedule (FusedAggPlan) is built host-side at prepare time; rest
chunks are placed AFTER the first tile of their row-block run with
repeated tile/H block indices, so Mosaic's revisit detection skips their
tile and H DMAs.
"""

from __future__ import annotations

import dataclasses
import functools as _functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.bsr import BSRMatrix, _round_up, unpack_mask01_tile


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedAggPlan:
    """One direction (forward or transposed) of the fused aggregation.

    ``step_*`` arrays define the S = T + R grid steps: ``step_kind`` 0 is
    a tile matmul (tile ``step_tile[g]``), 1 a remainder chunk (chunk
    ``step_chunk[g]``). ``step_rb`` carries one trailing sentinel entry
    for last-step-of-run detection. ``lrow`` holds each chunk's LOCAL
    output rows as f32 (sentinel tb = dead slot; f32 because v5e has no
    cheap small-int vector compare), ``slot_col``/``slot_scale`` drive
    the in-jit gather ``G = H[slot_col] * slot_scale``. ``colscale`` /
    ``rowscale`` are the rank-1 diagonal scalings shaped [n, tb] (2-D —
    a trailing unit dim would be 128x-padded by the TPU tiled layout;
    None for value-tile plans)."""

    B: BSRMatrix
    step_rb: jax.Array  # int32[S+1]
    step_cb: jax.Array  # int32[S]
    step_tile: jax.Array  # int32[S]
    step_chunk: jax.Array  # int32[S]
    step_kind: jax.Array  # int32[S]
    lrow: jax.Array  # f32[R, 8, K]
    slot_col: jax.Array  # int32[R*K]
    slot_scale: jax.Array  # f32[R*K]
    colscale: Optional[jax.Array]  # f32[n_ct, 8, tb]
    rowscale: Optional[jax.Array]  # f32[n_rt, 8, tb]
    K: int = dataclasses.field(metadata=dict(static=True))
    # static (step_lo, step_hi, rb_lo, rb_hi) call slices: schedules past
    # _MAX_STEPS are split at row-block-run boundaries into multiple
    # pallas calls — the per-call scalar-prefetch arrays live in SMEM,
    # and one 25k-step schedule (2^23 nodes) exhausts it
    slices: tuple = dataclasses.field(
        default=((0, -1, 0, -1),), metadata=dict(static=True)
    )
    # steps processed per grid step (bsr_spmm_fused_k): every row-block
    # run is padded to a multiple of k_steps with dead chunk steps, so a
    # grid step never straddles runs
    k_steps: int = dataclasses.field(default=1, metadata=dict(static=True))
    # true remainder chunk count, recorded at build time (-1 = legacy
    # plan predating the field: derive from S - T, exact when every
    # step is one tile or one chunk)
    rest_chunks: int = dataclasses.field(
        default=-1, metadata=dict(static=True)
    )

    @property
    def num_steps(self) -> int:
        return self.step_cb.shape[0]

    @property
    def num_chunks(self) -> int:
        """PADDED chunk count (R_pad >= 1 — the G/lrow leading dim the
        kernel indexes). For reporting use num_rest_chunks."""
        return self.lrow.shape[0]

    @property
    def num_rest_chunks(self) -> int:
        """True remainder chunk count (0 when the split left no rest)."""
        if self.rest_chunks >= 0:
            return self.rest_chunks
        return self.num_steps - self.B.tiles.shape[0]


# max grid steps per pallas call; 5 int32 scalar-prefetch arrays at this
# length use ~160 KB of SMEM (the 2^22 schedule ran fine at 10.7k steps /
# ~214 KB; the 2^23 one failed at 25k / ~503 KB)
_MAX_STEPS = 8192

# GCN fused kernel: chunk payload (G rows + lrow) residency budget
_RESIDENT_G_BUDGET = 56 << 20


def _chunk_cost_s(K: int, P: int = 128) -> float:
    """Per-rest-chunk seconds (grid-step overhead + max(DMA, MXU))."""
    dma = (K * P * 2 + 8 * K * 4) / 450e9
    mxu = 2.0 * 1024 * K * P / 180e12
    return 0.5e-6 + max(dma, mxu)


def build_fused_plan(
    B: BSRMatrix,
    rest: Optional[SparseMatrix],
    *,
    r1_row: Optional[np.ndarray] = None,
    r1_col: Optional[np.ndarray] = None,
    K: Optional[int] = None,
    tile_keys: Optional[np.ndarray] = None,
    device: bool = True,
    k_steps: int = 1,
    attach_chunks: bool = False,
) -> FusedAggPlan:
    """Host-side schedule build (numpy; ~ms at 50k rest edges).

    ``r1_row``/``r1_col`` present => rank-1 mask-tile mode: slot scales
    are ``r1_col[col]`` and the diagonal scalings ship as [tb, 1] blocks.
    Absent => value-tile mode: slot scales are the rest edge values.
    Requires a row-covering tile set (prepare_adjacency builds with
    cover_rows=True), so every row block has a tile run to attach rest
    chunks to.

    ``tile_keys`` (ops/bsr.bsr_tile_keys of the SAME source matrix and
    cover flags) supplies the tile layout host-side; without it the
    device tile_rb/tile_cb are pulled back — ~14 s each through the TPU
    relay at the 1M-node scale.

    ``device=False`` keeps every schedule array as host numpy (the
    distributed builder stacks per-shard plans before one sharded
    device_put)."""
    if tile_keys is not None:
        tile_rb = (tile_keys >> 32).astype(np.int64)
        tile_cb = (tile_keys & 0xFFFFFFFF).astype(np.int64)
        if len(tile_keys) == 0:
            tile_rb = np.zeros(1, np.int64)
            tile_cb = np.zeros(1, np.int64)
    else:
        tile_rb = np.asarray(B.tile_rb)
        tile_cb = np.asarray(B.tile_cb)
    T, tb = len(tile_rb), B.tb
    n_rt = B.n_row_tiles
    n_ct = _round_up(B.n_cols, tb) // tb
    rank1 = r1_col is not None

    if rest is not None and rest.nnz:
        rows = np.asarray(rest.rows[: rest.nnz]).astype(np.int64)
        cols = np.asarray(rest.cols[: rest.nnz]).astype(np.int64)
        vals = np.asarray(rest.vals[: rest.nnz], dtype=np.float32)
        order = np.argsort(rows // tb, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
        counts = np.bincount(rows // tb, minlength=n_rt)
    else:
        rows = cols = None
        counts = np.zeros(n_rt, np.int64)

    if K is None:
        # pick the slot width by the same honest constants the backend
        # cost model uses: chunk step cost vs wasted gather slots
        best = None
        for k in (128, 256, 512):
            nck = -(-counts // k)
            cost = nck.sum() * _chunk_cost_s(k) + nck.sum() * k * 4e-9
            if best is None or cost < best[0]:
                best = (cost, k)
        K = best[1]

    nc = (-(-counts // K)).astype(np.int64)  # chunks per row block
    R = int(nc.sum())
    R_pad = max(R, 1)
    lrow = np.full((R_pad, 8, K), float(tb), np.float32)
    slot_col = np.zeros(R_pad * K, np.int64)
    slot_scale = np.zeros(R_pad * K, np.float32)
    if R:
        blk_of_chunk = np.repeat(np.arange(n_rt), nc)
        edge_start = np.concatenate([[0], np.cumsum(counts)])
        cid = 0
        for b in np.nonzero(nc)[0]:
            base = edge_start[b]
            cnt = counts[b]
            for j in range(nc[b]):
                k = int(min(K, cnt - j * K))
                e = slice(base + j * K, base + j * K + k)
                # slot order within a chunk is semantically free (the
                # one-hot sums over slots) — sort by COLUMN so the
                # in-jit G gather reads ascending addresses
                sub = np.argsort(cols[e], kind="stable")
                ec, er = cols[e][sub], rows[e][sub]
                lrow[cid, 0, :k] = (er - b * tb).astype(np.float32)
                sl = slice(cid * K, cid * K + k)
                slot_col[sl] = ec
                slot_scale[sl] = (
                    r1_col[ec] if rank1 else vals[e][sub]
                )
                cid += 1
    else:
        blk_of_chunk = np.zeros(0, np.int64)

    # interleave. Default: per row block, [first tile][its chunks]
    # [remaining tiles] — every schedule entry is ONE tile or ONE chunk.
    # With ``attach_chunks``: chunks RIDE the tile steps of their block
    # — zero extra grid steps for the common skew, and the chunk block
    # DMA hides behind the tile matmul instead of paying an exposed
    # small-transfer latency on its own step (measured ~2-6 us per
    # standalone chunk step at the 2^20 scale, r5 diag).
    #
    # step_kind semantics (universal across all kernels):
    #   kind != 1 -> process the tile;  kind >= 1 -> process the chunk
    #   (0 = tile only, 1 = chunk only, 3 = tile + chunk)
    if attach_chunks:
        tiles_per_block = np.diff(
            np.searchsorted(tile_rb, np.arange(n_rt + 1))
        )
        S = T + int(np.maximum(nc - tiles_per_block, 0).sum())
    else:
        S = T + R
    s_rb = np.empty(S + 1, np.int32)
    s_cb = np.empty(S, np.int32)
    s_tile = np.empty(S, np.int32)
    s_chunk = np.empty(S, np.int32)
    s_kind = np.empty(S, np.int32)
    tile_start = np.searchsorted(tile_rb, np.arange(n_rt + 1))
    chunk_start = np.concatenate([[0], np.cumsum(nc)])
    pos = 0
    last_chunk = 0
    for b in range(n_rt):
        t0, t1 = tile_start[b], tile_start[b + 1]
        c0, c1 = chunk_start[b], chunk_start[b + 1]
        if t0 == t1:
            if c0 != c1:
                raise ValueError(
                    "rest edges in a row block with no tiles — build the "
                    "tile set with cover_rows=True"
                )
            continue
        nt, ncb = t1 - t0, c1 - c0
        if attach_chunks:
            na = min(ncb, nt)
            n = nt + (ncb - na)
            sl = slice(pos, pos + n)
            s_rb[sl] = tile_rb[t0]
            tids = np.concatenate(
                [np.arange(t0, t1), np.full(ncb - na, t1 - 1)]
            )
            kinds = np.concatenate([
                np.full(na, 3, np.int64),
                np.zeros(nt - na, np.int64),
                np.ones(ncb - na, np.int64),
            ])
            dead = max(c1 - 1, 0) if ncb else last_chunk
            chks = np.concatenate([
                np.arange(c0, c0 + na),
                np.full(nt - na, dead),
                np.arange(c0 + na, c1),
            ])
            s_tile[sl] = tids
            s_kind[sl] = kinds
            s_chunk[sl] = chks
            s_cb[sl] = tile_cb[tids]
            if ncb:
                last_chunk = c1 - 1
            pos += n
            continue
        n = nt + ncb
        sl = slice(pos, pos + n)
        s_rb[sl] = tile_rb[t0]
        # tiles of this run, with the chunks spliced in after the first
        tids = np.concatenate(
            [[t0], np.full(c1 - c0, t0), np.arange(t0 + 1, t1)]
        )
        kinds = np.concatenate(
            [[0], np.ones(c1 - c0, np.int64), np.zeros(t1 - t0 - 1, np.int64)]
        )
        chks = np.concatenate(
            [
                [last_chunk if c0 == c1 else c0],
                np.arange(c0, c1),
                np.full(t1 - t0 - 1, max(c1 - 1, 0) if c1 > c0 else last_chunk),
            ]
        )
        s_tile[sl] = tids
        s_kind[sl] = kinds
        s_chunk[sl] = chks
        s_cb[sl] = tile_cb[tids]
        if c1 > c0:
            last_chunk = c1 - 1
        pos += n
    assert pos == S, (pos, S)
    s_rb[S] = n_rt  # sentinel: final step is always 'last'

    if k_steps > 1:
        # pad every row-block run to a multiple of k_steps with dead
        # chunk steps (bsr_spmm_fused_k processes k schedule entries per
        # grid step and must never straddle a run). Dead steps revisit
        # the run's last tile/H blocks (DMA-skipped) and point at a
        # dead chunk whose lrow is all-sentinel.
        run_starts = np.flatnonzero(np.r_[True, s_rb[1:S] != s_rb[: S - 1]])
        run_ends = np.r_[run_starts[1:], S]
        pads = (-(run_ends - run_starts)) % k_steps
        if pads.sum():
            R_dead = R_pad
            R_pad += 1
            lrow = np.concatenate(
                [lrow, np.full((1, 8, K), float(tb), np.float32)]
            )
            slot_col = np.concatenate([slot_col, np.zeros(K, np.int64)])
            slot_scale = np.concatenate(
                [slot_scale, np.zeros(K, np.float32)]
            )
            S2 = S + int(pads.sum())
            n_rb2 = np.empty(S2 + 1, np.int32)
            n_cb2 = np.empty(S2, np.int32)
            n_tile2 = np.empty(S2, np.int32)
            n_chunk2 = np.empty(S2, np.int32)
            n_kind2 = np.empty(S2, np.int32)
            pos2 = 0
            for rs, re, pd in zip(run_starts, run_ends, pads):
                ln = re - rs
                sl = slice(pos2, pos2 + ln)
                n_rb2[sl] = s_rb[rs:re]
                n_cb2[sl] = s_cb[rs:re]
                n_tile2[sl] = s_tile[rs:re]
                n_chunk2[sl] = s_chunk[rs:re]
                n_kind2[sl] = s_kind[rs:re]
                if pd:
                    sp = slice(pos2 + ln, pos2 + ln + pd)
                    n_rb2[sp] = s_rb[re - 1]
                    n_cb2[sp] = s_cb[re - 1]
                    n_tile2[sp] = s_tile[re - 1]
                    n_chunk2[sp] = R_dead
                    n_kind2[sp] = 1
                pos2 += ln + pd
            assert pos2 == S2
            n_rb2[S2] = n_rt
            s_rb, s_cb, s_tile, s_chunk, s_kind = (
                n_rb2, n_cb2, n_tile2, n_chunk2, n_kind2
            )
            S = S2

    # static call slices at row-block-run boundaries (SMEM cap; see
    # _MAX_STEPS). Every slice covers whole output blocks.
    slices = []
    run_starts = np.flatnonzero(np.r_[True, s_rb[1:S] != s_rb[: S - 1]])
    lo = 0
    while lo < S:
        if S - lo <= _MAX_STEPS:
            hi = S
        else:
            k = np.searchsorted(run_starts, lo + _MAX_STEPS, side="right") - 1
            hi = int(run_starts[k])
            if hi <= lo:  # one run longer than the cap: keep it whole
                k2 = np.searchsorted(run_starts, lo, side="right")
                hi = int(run_starts[k2]) if k2 < len(run_starts) else S
                import warnings

                warnings.warn(
                    f"fused schedule: one row-block run spans {hi - lo} "
                    f"steps (> the {_MAX_STEPS}-step SMEM-safe cap) and "
                    "cannot be split without breaking in-run "
                    "accumulation; the compile may be very slow or fail "
                    "with RESOURCE_EXHAUSTED. Reduce tb or re-partition "
                    "the hub rows.",
                    stacklevel=3,
                )
        rb_lo = int(s_rb[lo])
        rb_hi = int(s_rb[hi]) if hi < S else n_rt
        slices.append((lo, hi, rb_lo, rb_hi))
        lo = hi

    dev = (lambda x: jax.device_put(x)) if device else np.asarray
    colscale = rowscale = None
    if rank1:
        cs = np.zeros(n_ct * tb, np.float32)
        cs[: len(r1_col)] = r1_col
        rs = np.zeros(n_rt * tb, np.float32)
        rs[: len(r1_row)] = r1_row
        # [n, 8, tb] with data in sublane row 0 (the lrow pattern) —
        # NOT [n, tb, 1]: TPU tiled layouts pad a trailing unit dim to
        # 128 lanes, so that form stored (and copied) 128x its logical
        # bytes — 512 MB per scale at 2^20, 2 GB at 2^22 (the r5
        # products-density OOM). 8 sublanes keep the (8, 128) block
        # rule; the kernel reads row 0 and relayouts to [tb, 1].
        def _rows8(v, nblk):
            out = np.zeros((nblk, 8, tb), np.float32)
            out[:, 0, :] = v.reshape(nblk, tb)
            return out

        colscale = dev(_rows8(cs, n_ct))
        rowscale = dev(_rows8(rs, n_rt))
    return FusedAggPlan(
        B=B,
        step_rb=dev(s_rb),
        step_cb=dev(s_cb),
        step_tile=dev(s_tile),
        step_chunk=dev(s_chunk),
        step_kind=dev(s_kind),
        lrow=dev(lrow),
        slot_col=dev(slot_col.astype(np.int32)),
        slot_scale=dev(slot_scale),
        colscale=colscale,
        rowscale=rowscale,
        K=K,
        slices=tuple(slices),
        k_steps=k_steps,
        rest_chunks=R,
    )


def pad_fused_plan(
    plan: FusedAggPlan, *, S: int, T: int, R: int, K: int
) -> FusedAggPlan:
    """Pad a fused schedule to sticky maxima so re-prepared sampled
    batches keep ONE traced shape (the fused analogue of
    ops/bsr.pad_bsr_tile_count; train/loop._pad_prep_tiles drives it).

    Every padding dimension is a no-op by construction:

    - tiles pad with all-zero tiles (never referenced by any step);
    - chunk slots pad with the sentinel local row ``tb`` (the one-hot
      matches no output row) and zero scale/col;
    - K widens with dead slots per chunk (the slot layout is [R, K]);
    - schedule steps pad with CHUNK steps pointing at a dead chunk and
      revisiting the last row-block run — they add zero to the resident
      accumulator, and the run's output write just moves to the final
      padding step (same accumulator, same row scale).

    Single-slice schedules only (sampled batches sit far below the
    _MAX_STEPS SMEM cap); multi-slice plans raise."""
    from sgracex1_tpu.ops.bsr import pad_bsr_tile_count

    S0, T0 = plan.num_steps, plan.B.num_tiles
    R0, K0 = plan.num_chunks, plan.K
    if (S, T, R, K) == (S0, T0, R0, K0):
        return plan
    if not (S >= S0 and T >= T0 and R >= R0 and K >= K0):
        raise ValueError(
            f"pad_fused_plan targets must dominate: have "
            f"{(S0, T0, R0, K0)}, asked {(S, T, R, K)}"
        )
    eff = plan.slices
    if len(eff) > 1:
        raise ValueError("cannot pad a multi-slice fused schedule")
    # contract: padding steps point at chunk row R-1, which must be DEAD
    # (all-sentinel lrow). Guaranteed whenever R exceeds the plan's true
    # chunk count — K/R padding below fills new rows with the sentinel,
    # and _pad_prep_tiles' sticky targets always keep one extra row.
    # (num_rest_chunks cannot express this for re-padded plans: padding
    # steps count as chunk steps there.)
    tb = plan.B.tb
    n_rt = plan.B.n_row_tiles

    lrow = plan.lrow
    slot_col = plan.slot_col.reshape(R0, K0)
    slot_scale = plan.slot_scale.reshape(R0, K0)
    if K > K0:
        lrow = jnp.pad(lrow, ((0, 0), (0, 0), (0, K - K0)),
                       constant_values=float(tb))
        slot_col = jnp.pad(slot_col, ((0, 0), (0, K - K0)))
        slot_scale = jnp.pad(slot_scale, ((0, 0), (0, K - K0)))
    if R > R0:
        lrow = jnp.pad(lrow, ((0, R - R0), (0, 0), (0, 0)),
                       constant_values=float(tb))
        slot_col = jnp.pad(slot_col, ((0, R - R0), (0, 0)))
        slot_scale = jnp.pad(slot_scale, ((0, R - R0), (0, 0)))

    def _pad_steps(a, value):
        return jnp.concatenate(
            [a, jnp.full((S - S0,), value, a.dtype)]
        ) if S > S0 else a

    last_rb = plan.step_rb[S0 - 1]
    step_rb = plan.step_rb[:S0]
    step_rb = jnp.concatenate([
        step_rb,
        jnp.broadcast_to(last_rb, (S - S0,)).astype(step_rb.dtype),
        plan.step_rb[S0:],  # the n_rt sentinel stays terminal
    ])
    return dataclasses.replace(
        plan,
        B=pad_bsr_tile_count(plan.B, T),
        step_rb=step_rb,
        step_cb=_pad_steps(plan.step_cb, plan.step_cb[S0 - 1]),
        step_tile=_pad_steps(plan.step_tile, plan.step_tile[S0 - 1]),
        step_chunk=_pad_steps(plan.step_chunk, R - 1),
        step_kind=_pad_steps(plan.step_kind, 1),
        lrow=lrow,
        slot_col=slot_col.reshape(R * K),
        slot_scale=slot_scale.reshape(R * K),
        K=K,
        slices=((0, S, 0, n_rt),),
    )


def _fused_kernel(
    srb, scb, stile, schunk, skind,
    a_ref, h_ref, g_ref, lrow_ref, *scale_refs,
    tb: int, K: int, with_scales: bool, resident: bool = False,
    group: int = 1, rb_lo: int = 0,
):
    if with_scales:
        cs_ref, rs_ref, out_ref, acc_ref = scale_refs
    else:
        out_ref, acc_ref = scale_refs
    g = pl.program_id(0)
    S = pl.num_programs(0)
    if group == 1:
        first = jnp.logical_or(
            g == 0, srb[g] != srb[jnp.maximum(g - 1, 0)]
        )
    else:
        # output blocks span ``group`` row blocks: zero the whole
        # grouped accumulator at the first step of each GROUP
        gid = (srb[g] - rb_lo) // group
        first = jnp.logical_or(
            g == 0,
            gid != (srb[jnp.maximum(g - 1, 0)] - rb_lo) // group,
        )
        sub = (srb[g] - rb_lo) % group  # leading-dim accumulator slot

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def _acc_add(v):
        if group == 1:
            acc_ref[:] += v
        else:
            # dynamic leading-dim index — an address offset, no relayout
            acc_ref[sub] += v

    # universal kind semantics: != 1 -> tile, >= 1 -> chunk (3 = both)
    @pl.when(skind[g] != 1)
    def _():
        a = a_ref[0]
        if a.shape[-1] == tb // 8 and tb > 8:  # 1-bit packed mask tile
            a = unpack_mask01_tile(a, tb, dtype=jnp.bfloat16)
        else:
            a = a.astype(jnp.bfloat16)
        h = h_ref[:]
        if with_scales:
            # row 0 of the (1, 8, tb) block -> [tb, 1] column relayout
            h = h * cs_ref[0, 0:1, :].reshape(-1, 1).astype(jnp.bfloat16)
        _acc_add(jax.lax.dot_general(
            a, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    @pl.when(skind[g] >= 1)
    def _():
        # one-hot scatter of K pre-gathered rest rows into the resident
        # accumulator: rows ride the MXU, dead slots (lrow == tb) match
        # no output row and add zero
        if resident:
            # VMEM-resident chunk payloads, dynamically indexed by the
            # prefetched chunk id (per-step small-block streaming pays
            # exposed DMA latency — the flash kernels' r5 lesson)
            ch = schunk[g]
            l = lrow_ref[ch, 0:1, :]
            gv = g_ref[ch]
        else:
            l = lrow_ref[0, 0:1, :]  # [1, K] f32 local rows
            gv = g_ref[0]
        # iota is integer-only in Mosaic; the compare runs in f32 (exact
        # for values <= tb, and v5e's small-int vector compare is weak)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tb, K), 0).astype(
            jnp.float32
        )
        oh = (iota == l).astype(jnp.bfloat16)
        _acc_add(jax.lax.dot_general(
            oh, gv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    if group == 1:
        last = jnp.logical_or(g == S - 1, srb[g + 1] != srb[g])
    else:
        last = jnp.logical_or(
            g == S - 1, (srb[g + 1] - rb_lo) // group != gid
        )

    @pl.when(last)
    def _():
        o = acc_ref[:]
        if with_scales:
            if group == 1:
                o = o * rs_ref[0, 0:1, :].reshape(-1, 1)
            else:
                # (group, 1, tb) -> (group, tb, 1): unit-dim move only
                o = o * rs_ref[:, 0:1, :].reshape(group, tb, 1)
        out_ref[:] = o.astype(out_ref.dtype)


def bsr_spmm_fused(
    plan: FusedAggPlan, H: jax.Array, *, interpret: bool | None = None,
    group: int = 1,
) -> jax.Array:
    """out = A @ H for A = diag(r1_row) . M_tiles . diag(r1_col) + rest
    (or A = tiles + rest in value mode), in one kernel pass. Returns
    bf16 [n_rows, P] (the accumulator is f32 VMEM scratch; the halved
    output DMA is part of the point).

    ``group`` maps ``group`` consecutive row blocks onto ONE output
    block (accumulator becomes (group, tb, P) scratch indexed by the
    step's row block mod group): short tile runs pay an output-block
    drain per RUN (~0.61/3.86 us at tb=256/1024 — DESIGN §1.2d), and
    grouping divides the number of drains by ``group``."""
    B = plan.B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tb, K = B.tb, plan.K
    inner = B.tiles.shape[-1]
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = H.shape[1]
    with_scales = plan.colscale is not None

    Hb = H.astype(jnp.bfloat16)
    # pre-gathered, pre-scaled remainder rows (zero scale on dead slots)
    G = (
        jnp.take(Hb, plan.slot_col, axis=0)
        * plan.slot_scale[:, None].astype(jnp.bfloat16)
    ).reshape(plan.num_chunks, K, P)
    if Hb.shape[0] != n_ct * tb:
        Hb = jnp.pad(Hb, ((0, n_ct * tb - Hb.shape[0]), (0, 0)))

    # chunk payloads VMEM-resident when they fit (one bulk DMA instead
    # of per-step small blocks whose latency is exposed — r5)
    payload = G.size * 2 + plan.lrow.size * 4
    resident = payload <= _RESIDENT_G_BUDGET
    if resident:
        chunk_specs = [
            pl.BlockSpec(
                G.shape, lambda g, rb, cb, ti, ch, kd: (0, 0, 0)
            ),
            pl.BlockSpec(
                plan.lrow.shape,
                lambda g, rb, cb, ti, ch, kd: (0, 0, 0),
            ),
        ]
    else:
        chunk_specs = [
            pl.BlockSpec(
                (1, K, P), lambda g, rb, cb, ti, ch, kd: (ch[g], 0, 0)
            ),
            pl.BlockSpec(
                (1, 8, K), lambda g, rb, cb, ti, ch, kd: (ch[g], 0, 0)
            ),
        ]
    in_specs = [
        pl.BlockSpec(
            (1, tb, inner), lambda g, rb, cb, ti, ch, kd: (ti[g], 0, 0)
        ),
        pl.BlockSpec((tb, P), lambda g, rb, cb, ti, ch, kd: (cb[g], 0)),
    ] + chunk_specs
    operands = [B.tiles, Hb, G, plan.lrow]
    if with_scales:
        in_specs += [
            pl.BlockSpec(
                (1, 8, tb), lambda g, rb, cb, ti, ch, kd: (cb[g], 0, 0)
            ),
            pl.BlockSpec(
                (1, 8, tb), lambda g, rb, cb, ti, ch, kd: (rb[g], 0, 0)
            ),
        ]
        operands += [plan.colscale, plan.rowscale]

    S = plan.num_steps
    slices = plan.slices
    if len(slices) == 1 and slices[0][1] in (-1, S):
        slices = ((0, S, 0, n_rt),)

    def _call(lo: int, hi: int, rb_lo: int, rb_hi: int) -> jax.Array:
        n_steps = hi - lo
        frac = n_steps / S
        nr = rb_hi - rb_lo
        if group == 1:
            out_specs = pl.BlockSpec(
                (tb, P), lambda g, rb, cb, ti, ch, kd: (rb[g] - rb_lo, 0)
            )
            out_shape = jax.ShapeDtypeStruct((nr * tb, P), jnp.bfloat16)
            scratch = [pltpu.VMEM((tb, P), jnp.float32)]
            call_specs, call_ops = in_specs, operands
        else:
            nr_pad = _round_up(nr, group)
            out_specs = pl.BlockSpec(
                (group, tb, P),
                lambda g, rb, cb, ti, ch, kd: ((rb[g] - rb_lo) // group, 0, 0),
            )
            out_shape = jax.ShapeDtypeStruct(
                (nr_pad, tb, P), jnp.bfloat16
            )
            scratch = [pltpu.VMEM((group, tb, P), jnp.float32)]
            call_specs, call_ops = list(in_specs), list(operands)
            if with_scales:
                # rowscale re-blocked per call: (group, 8, tb) blocks
                # over the slice's row range, indexed by group id
                rs = plan.rowscale[rb_lo:rb_hi]
                rs = jnp.pad(
                    rs, ((0, nr_pad - nr), (0, 0), (0, 0))
                )
                call_specs[-1] = pl.BlockSpec(
                    (group, 8, tb),
                    lambda g, rb, cb, ti, ch, kd: (
                        (rb[g] - rb_lo) // group, 0, 0
                    ),
                )
                call_ops[-1] = rs
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps,),
            in_specs=call_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            _functools.partial(
                _fused_kernel, tb=tb, K=K, with_scales=with_scales,
                resident=resident, group=group, rb_lo=rb_lo,
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            **({} if not resident else dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(
                        100 << 20, payload + (40 << 20)
                    )
                )
            )),
            cost_estimate=pl.CostEstimate(
                flops=int(
                    frac
                    * (
                        2 * B.num_tiles * tb * tb * P
                        + 2 * plan.num_chunks * tb * K * P
                    )
                ),
                bytes_accessed=int(
                    frac
                    * (
                        B.num_tiles
                        * (tb * inner * B.tiles.dtype.itemsize + tb * P * 2)
                        + plan.num_chunks * K * P * 2
                    )
                    + (rb_hi - rb_lo) * tb * P * 2
                ),
                transcendentals=0,
            ),
        )(
            plan.step_rb[lo : hi + 1],
            plan.step_cb[lo:hi],
            plan.step_tile[lo:hi],
            plan.step_chunk[lo:hi],
            plan.step_kind[lo:hi],
            *call_ops,
        )

    def _flat(part, sl):
        if group == 1:
            return part
        # drop the group-alignment padding rows appended to this slice
        return part.reshape(-1, P)[: (sl[3] - sl[2]) * tb]

    parts = [_flat(_call(*sl), sl) for sl in slices]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[: B.n_rows]


def _fused_kernel_k(
    srb, scb, stile, schunk, skind, *refs,
    tb: int, K: int, with_scales: bool, k: int,
):
    """k schedule entries per grid step (VERDICT r3/r4 carry-over: probe
    the per-grid-step overhead). Runs are padded to multiples of k at
    build time (build_fused_plan(k_steps=k)), so a grid step never
    straddles an output row block; each sub-entry has its own
    tile/H/G/lrow(/colscale) BlockSpecs — same DMA volume, 1/k the grid
    bookkeeping."""
    n_in = 4 + (1 if with_scales else 0)
    ins = refs[: k * n_in]
    if with_scales:
        rs_ref, out_ref, acc_ref = refs[k * n_in :]
    else:
        out_ref, acc_ref = refs[k * n_in :]
    g = pl.program_id(0)
    S = pl.num_programs(0)
    first = jnp.logical_or(
        g == 0, srb[k * g] != srb[jnp.maximum(k * g - 1, 0)]
    )

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for i in range(k):
        a_ref = ins[i * n_in + 0]
        h_ref = ins[i * n_in + 1]
        g_ref = ins[i * n_in + 2]
        lrow_ref = ins[i * n_in + 3]
        cs_ref = ins[i * n_in + 4] if with_scales else None
        idx = k * g + i

        @pl.when(skind[idx] != 1)
        def _(a_ref=a_ref, h_ref=h_ref, cs_ref=cs_ref):
            a = a_ref[0]
            if a.shape[-1] == tb // 8 and tb > 8:
                a = unpack_mask01_tile(a, tb, dtype=jnp.bfloat16)
            else:
                a = a.astype(jnp.bfloat16)
            h = h_ref[:]
            if with_scales:
                h = h * cs_ref[0, 0:1, :].reshape(-1, 1).astype(
                    jnp.bfloat16
                )
            acc_ref[:] += jax.lax.dot_general(
                a, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(skind[idx] >= 1)
        def _(g_ref=g_ref, lrow_ref=lrow_ref):
            l = lrow_ref[0, 0:1, :]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (tb, K), 0
            ).astype(jnp.float32)
            oh = (iota == l).astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                oh, g_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    last = jnp.logical_or(g == S - 1, srb[k * g + k] != srb[k * g])

    @pl.when(last)
    def _():
        o = acc_ref[:]
        if with_scales:
            o = o * rs_ref[0, 0:1, :].reshape(-1, 1)
        out_ref[:] = o.astype(out_ref.dtype)


def bsr_spmm_fused_k(
    plan: FusedAggPlan, H: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """bsr_spmm_fused processing ``plan.k_steps`` schedule entries per
    grid step (build the plan with ``k_steps=k``). Semantically
    identical; per-grid-step overhead amortizes k-fold."""
    B = plan.B
    k = plan.k_steps
    if k == 1:
        return bsr_spmm_fused(plan, H, interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tb, K = B.tb, plan.K
    inner = B.tiles.shape[-1]
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = H.shape[1]
    with_scales = plan.colscale is not None

    Hb = H.astype(jnp.bfloat16)
    G = (
        jnp.take(Hb, plan.slot_col, axis=0)
        * plan.slot_scale[:, None].astype(jnp.bfloat16)
    ).reshape(plan.num_chunks, K, P)
    if Hb.shape[0] != n_ct * tb:
        Hb = jnp.pad(Hb, ((0, n_ct * tb - Hb.shape[0]), (0, 0)))

    def sub_specs(i):
        specs = [
            pl.BlockSpec(
                (1, tb, inner),
                lambda g, rb, cb, ti, ch, kd, i=i: (ti[k * g + i], 0, 0),
            ),
            pl.BlockSpec(
                (tb, P),
                lambda g, rb, cb, ti, ch, kd, i=i: (cb[k * g + i], 0),
            ),
            pl.BlockSpec(
                (1, K, P),
                lambda g, rb, cb, ti, ch, kd, i=i: (ch[k * g + i], 0, 0),
            ),
            pl.BlockSpec(
                (1, 8, K),
                lambda g, rb, cb, ti, ch, kd, i=i: (ch[k * g + i], 0, 0),
            ),
        ]
        if with_scales:
            specs.append(pl.BlockSpec(
                (1, 8, tb),
                lambda g, rb, cb, ti, ch, kd, i=i: (cb[k * g + i], 0, 0),
            ))
        return specs

    in_specs = []
    operands = []
    per = [B.tiles, Hb, G, plan.lrow] + (
        [plan.colscale] if with_scales else []
    )
    for i in range(k):
        in_specs += sub_specs(i)
        operands += per
    if with_scales:
        in_specs.append(pl.BlockSpec(
            (1, 8, tb),
            lambda g, rb, cb, ti, ch, kd: (rb[k * g], 0, 0),
        ))
        operands.append(plan.rowscale)

    S = plan.num_steps
    slices = plan.slices
    if len(slices) == 1 and slices[0][1] in (-1, S):
        slices = ((0, S, 0, n_rt),)

    def _call(lo, hi, rb_lo, rb_hi):
        n_steps = hi - lo
        assert n_steps % k == 0, (lo, hi, k)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps // k,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tb, P),
                lambda g, rb, cb, ti, ch, kd: (rb[k * g] - rb_lo, 0),
            ),
            scratch_shapes=[pltpu.VMEM((tb, P), jnp.float32)],
        )
        return pl.pallas_call(
            _functools.partial(
                _fused_kernel_k, tb=tb, K=K, with_scales=with_scales,
                k=k,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                ((rb_hi - rb_lo) * tb, P), jnp.bfloat16
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(
                    (n_steps / S)
                    * (
                        2 * B.num_tiles * tb * tb * P
                        + 2 * plan.num_chunks * tb * K * P
                    )
                ),
                bytes_accessed=int(
                    (n_steps / S)
                    * (
                        B.num_tiles
                        * (tb * inner * B.tiles.dtype.itemsize + tb * P * 2)
                        + plan.num_chunks * K * P * 2
                    )
                    + (rb_hi - rb_lo) * tb * P * 2
                ),
                transcendentals=0,
            ),
        )(
            plan.step_rb[lo : hi + 1],
            plan.step_cb[lo:hi],
            plan.step_tile[lo:hi],
            plan.step_chunk[lo:hi],
            plan.step_kind[lo:hi],
            *operands,
        )

    parts = [_call(*sl) for sl in slices]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[: B.n_rows]


def _fused_int8_kernel(
    srb, scb, stile, schunk, skind,
    a_ref, h_ref, g_ref, lrow_ref, vrow_ref, out_ref,
    acc_ref, accf_ref, *, tb: int, K: int,
):
    """Full-integer fused schedule: tile steps run shifted-int8 x int8 ->
    int32 on the int8 MXU (per-tile zero-point correction, the
    ops/bsr._bsr_int8_kernel identity); remainder chunk steps run a
    VALUE-carrying one-hot in bf16 (the 0..255 adjacency grid and the
    +-127 feature grid are exact in bf16, and the f32 accumulator is
    exact for row remainder sums below 2^24 — far above the engine's
    amax-tracked ranges). The two accumulators merge at the last step of
    each output row block."""
    g = pl.program_id(0)
    S = pl.num_programs(0)
    first = jnp.logical_or(g == 0, srb[g] != srb[jnp.maximum(g - 1, 0)])

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        accf_ref[:] = jnp.zeros_like(accf_ref)

    @pl.when(skind[g] != 1)
    def _():
        a = a_ref[0]  # int8, unsigned grid shifted by -128
        h = h_ref[:]  # int8, signed grid
        mm = jax.lax.dot_general(
            a, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        corr = 128 * jnp.sum(h.astype(jnp.int32), axis=0, keepdims=True)
        acc_ref[:] += mm + corr

    @pl.when(skind[g] >= 1)
    def _():
        l = lrow_ref[0, 0:1, :]  # [1, K] f32 local rows
        v = vrow_ref[0, 0:1, :]  # [1, K] f32 quantized edge values
        iota = jax.lax.broadcasted_iota(jnp.int32, (tb, K), 0).astype(
            jnp.float32
        )
        oh = (iota == l).astype(jnp.bfloat16) * v.astype(jnp.bfloat16)
        gq = g_ref[0].astype(jnp.bfloat16)  # int8 rows, exact in bf16
        accf_ref[:] += jax.lax.dot_general(
            oh, gq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    last = jnp.logical_or(g == S - 1, srb[g + 1] != srb[g])

    @pl.when(last)
    def _():
        out_ref[:] = acc_ref[:] + accf_ref[:].astype(jnp.int32)


def bsr_spmm_int8_fused(
    plan: FusedAggPlan, Hq: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """Full-integer ``Aq @ Hq`` for a HYBRID split: shifted-int8 dense
    tiles + quantized remainder chunks, one fused schedule (the int8
    counterpart of bsr_spmm_fused — the capability that makes
    full-integer inference possible at the 2^20+ scale, where a full-
    adjacency int8 tile set is tens of GB but the hybrid one fits).

    ``plan``: value-mode FusedAggPlan (quant/int8.prepare_int8_hybrid)
    whose B holds SHIFTED int8 tiles and whose slot scales are the
    remainder's quantized (unsigned-grid) values. ``Hq``: signed int8
    [N, P]. Returns the exact int32 accumulator [n_rows, P]."""
    B = plan.B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tb, K = B.tb, plan.K
    n_ct = _round_up(B.n_cols, tb) // tb
    n_rt = B.n_row_tiles
    P = Hq.shape[1]
    assert plan.colscale is None, "int8 schedule must be value-mode"

    G = jnp.take(Hq, plan.slot_col, axis=0).reshape(
        plan.num_chunks, K, P
    )
    vrow = jnp.broadcast_to(
        plan.slot_scale.reshape(plan.num_chunks, 1, K),
        (plan.num_chunks, 8, K),
    )
    if Hq.shape[0] != n_ct * tb:
        Hq = jnp.pad(Hq, ((0, n_ct * tb - Hq.shape[0]), (0, 0)))

    in_specs = [
        pl.BlockSpec(
            (1, tb, tb), lambda g, rb, cb, ti, ch, kd: (ti[g], 0, 0)
        ),
        pl.BlockSpec((tb, P), lambda g, rb, cb, ti, ch, kd: (cb[g], 0)),
        pl.BlockSpec((1, K, P), lambda g, rb, cb, ti, ch, kd: (ch[g], 0, 0)),
        pl.BlockSpec((1, 8, K), lambda g, rb, cb, ti, ch, kd: (ch[g], 0, 0)),
        pl.BlockSpec((1, 8, K), lambda g, rb, cb, ti, ch, kd: (ch[g], 0, 0)),
    ]
    operands = [B.tiles, Hq, G, plan.lrow, vrow]
    S = plan.num_steps
    slices = plan.slices
    if len(slices) == 1 and slices[0][1] in (-1, S):
        slices = ((0, S, 0, n_rt),)

    def _call(lo, hi, rb_lo, rb_hi):
        frac = (hi - lo) / S
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(hi - lo,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tb, P), lambda g, rb, cb, ti, ch, kd: (rb[g] - rb_lo, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((tb, P), jnp.int32),
                pltpu.VMEM((tb, P), jnp.float32),
            ],
        )
        return pl.pallas_call(
            _functools.partial(_fused_int8_kernel, tb=tb, K=K),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                ((rb_hi - rb_lo) * tb, P), jnp.int32
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(
                    frac
                    * (
                        2 * B.num_tiles * tb * tb * P
                        + 2 * plan.num_chunks * tb * K * P
                    )
                ),
                bytes_accessed=int(
                    frac
                    * (
                        B.num_tiles * (tb * tb + tb * P)
                        + plan.num_chunks * K * P
                    )
                    + (rb_hi - rb_lo) * tb * P * 4
                ),
                transcendentals=0,
            ),
        )(
            plan.step_rb[lo : hi + 1],
            plan.step_cb[lo:hi],
            plan.step_tile[lo:hi],
            plan.step_chunk[lo:hi],
            plan.step_kind[lo:hi],
            *operands,
        )

    parts = [_call(*sl) for sl in slices]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[: B.n_rows]
