"""Pallas TPU SpMM kernel: tiled one-hot double-matmul.

The reference's hot loop streams one nonzero per cycle through FP-add rotors
(``dsp_kernel_wrapper_*``, kernelMatrixmult_all.cpp:1960-2152). A literal
translation (per-edge serial gather/accumulate) wastes the TPU: random access
is the one thing the hardware cannot vectorize. This kernel reformulates both
the gather and the scatter as **MXU matmuls against one-hot matrices**:

    out[RB, P] += S^T[RB, BE] @ ( (G[BE, CB] @ H_tile[CB, P]) * val[:, None] )

where G/S are one-hot encodings of the (col, row) indices of one edge block,
built on the VPU from broadcasted iota compares. Edges are sorted by
(row_block, col_block) tile on the host and padded to edge-block multiples
(``plan_spmm``); the grid walks edge groups with scalar-prefetched tile
coordinates driving the H/out BlockSpec index maps, accumulating each output
row-block in VMEM across its column tiles (the same revisit pattern as a
matmul k-loop). Padding edges carry val=0 and contribute nothing.

Mosaic requires the last two dims of every block to be (8k, 128k), so the
per-group edge arrays are laid out [G*8, BE/8] (sublane-major) and the
one-hot contractions are batched over the 8 sublanes.

This is the TPU analogue of the reference's two-level tiling: RB/CB play the
role of B_WIDTH_BLOCK weight tiles + SPMM_BLOCK row groups; the one-hot
matmul replaces the per-nnz MAC pipeline.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgracex1_tpu.graph.csr import SparseMatrix

_SUB = 8  # sublane count of the edge-array layout


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpMMPlan:
    """Host-preprocessed edge schedule for the one-hot tiled kernel.

    Edge arrays are [G*8, BE/8]: group g owns rows [g*8, (g+1)*8).
    """

    lrow: jax.Array  # int32 — row index within the row block
    lcol: jax.Array  # int32 — col index within the col block
    val: jax.Array  # float32
    perm: jax.Array  # int32 — original edge index per slot, -1 for padding
    tile_rb: jax.Array  # int32[G] — row-block id per group
    tile_cb: jax.Array  # int32[G] — col-block id per group
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    rb: int = dataclasses.field(metadata=dict(static=True))
    cb: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_groups(self) -> int:
        return self.val.shape[0] // _SUB

    @property
    def be(self) -> int:
        return self.val.shape[1] * _SUB


def plan_spmm(
    A: SparseMatrix,
    *,
    rb: int = 1024,
    cb: int = 1024,
    be: int = 1024,
) -> SpMMPlan:
    """Sort edges into (row-block, col-block) tiles and pad to edge groups.

    Groups never straddle a tile boundary, and groups are ordered by
    (row_block, col_block) so each output row-block is visited by a
    contiguous run of grid steps. ``be`` must be a multiple of 1024
    (8 sublanes x 128 lanes).
    """
    assert be % (_SUB * 128) == 0, "edge block must be a multiple of 1024"
    ec = be // _SUB

    r = np.asarray(A.rows[: A.nnz])
    c = np.asarray(A.cols[: A.nnz])
    v = np.asarray(A.vals[: A.nnz], dtype=np.float32)

    from sgracex1_tpu.runtime import native

    fast = native.plan_tiles(r, c, v, rb, cb, be) if A.nnz else None
    if fast is not None:
        lrow, lcol, val, perm, trb_a, tcb_a = fast
        return SpMMPlan(
            lrow=jnp.asarray(lrow.reshape(-1, ec)),
            lcol=jnp.asarray(lcol.reshape(-1, ec)),
            val=jnp.asarray(val.reshape(-1, ec)),
            perm=jnp.asarray(perm.reshape(-1, ec)),
            tile_rb=jnp.asarray(trb_a),
            tile_cb=jnp.asarray(tcb_a),
            n_rows=A.n_rows,
            n_cols=A.n_cols,
            rb=rb,
            cb=cb,
            nnz=A.nnz,
        )

    trb, tcb = r // rb, c // cb
    order = np.lexsort((c, r, tcb, trb))
    r, c, v, trb, tcb = r[order], c[order], v[order], trb[order], tcb[order]

    tile_key = trb.astype(np.int64) * (1 << 32) + tcb
    uniq, starts, counts = np.unique(
        tile_key, return_index=True, return_counts=True
    )
    metas, lrs, lcs, vvs, pms = [], [], [], [], []
    for s, cnt, key in zip(starts, counts, uniq):
        g_rb, g_cb = int(key >> 32), int(key & 0xFFFFFFFF)
        for off in range(0, int(cnt), be):
            k = min(be, int(cnt) - off)
            lr = np.zeros(be, np.int32)
            lc = np.zeros(be, np.int32)
            vv = np.zeros(be, np.float32)
            pm = np.full(be, -1, np.int32)
            sl = slice(s + off, s + off + k)
            lr[:k] = r[sl] - g_rb * rb
            lc[:k] = c[sl] - g_cb * cb
            vv[:k] = v[sl]
            pm[:k] = order[sl]
            metas.append((g_rb, g_cb))
            lrs.append(lr.reshape(_SUB, ec))
            lcs.append(lc.reshape(_SUB, ec))
            vvs.append(vv.reshape(_SUB, ec))
            pms.append(pm.reshape(_SUB, ec))

    if not metas:  # empty matrix — one all-padding group
        metas = [(0, 0)]
        lrs = [np.zeros((_SUB, ec), np.int32)]
        lcs = [np.zeros((_SUB, ec), np.int32)]
        vvs = [np.zeros((_SUB, ec), np.float32)]
        pms = [np.full((_SUB, ec), -1, np.int32)]

    return SpMMPlan(
        lrow=jnp.asarray(np.concatenate(lrs, axis=0)),
        lcol=jnp.asarray(np.concatenate(lcs, axis=0)),
        val=jnp.asarray(np.concatenate(vvs, axis=0)),
        perm=jnp.asarray(np.concatenate(pms, axis=0)),
        tile_rb=jnp.asarray(np.array([m[0] for m in metas], np.int32)),
        tile_cb=jnp.asarray(np.array([m[1] for m in metas], np.int32)),
        n_rows=A.n_rows,
        n_cols=A.n_cols,
        rb=rb,
        cb=cb,
        nnz=A.nnz,
    )


def plan_with_vals(plan: SpMMPlan, vals: jax.Array) -> SpMMPlan:
    """Substitute runtime edge values (attention weights, quantized values)
    into a plan. ``vals`` follows the original SparseMatrix edge order."""
    v = jnp.where(
        plan.perm >= 0,
        jnp.take(vals, jnp.maximum(plan.perm, 0)),
        jnp.zeros((), vals.dtype),
    )
    return dataclasses.replace(plan, val=v.astype(jnp.float32))


def _spmm_kernel(
    # scalar prefetch
    tile_rb,
    tile_cb,
    # inputs
    lrow_ref,
    lcol_ref,
    val_ref,
    h_ref,
    # output
    out_ref,
):
    g = pl.program_id(0)
    rb = out_ref.shape[0]
    cb = h_ref.shape[0]
    ec = lrow_ref.shape[1]

    first_visit = jnp.logical_or(
        g == 0, tile_rb[g] != tile_rb[jnp.maximum(g - 1, 0)]
    )

    @pl.when(first_visit)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lcol = lcol_ref[:]  # (8, ec)
    lrow = lrow_ref[:]
    val = val_ref[:]

    # one-hot gather, batched over sublanes: (8, ec, CB) @ (CB, P) -> (8, ec, P)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, ec, cb), 2)
    G = (lcol[:, :, None] == col_iota).astype(jnp.bfloat16)
    h = h_ref[:].astype(jnp.bfloat16)
    gathered = jax.lax.dot_general(
        G, h, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    weighted = (gathered * val[:, :, None]).astype(jnp.bfloat16)

    # one-hot scatter: (RB, ec) @ (ec, P) per sublane, unrolled (Mosaic's
    # tpu.matmul does not support multi-dim contractions)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, ec, rb), 2)
    S = (lrow[:, :, None] == row_iota).astype(jnp.bfloat16)
    acc = out_ref[:]
    for s in range(_SUB):
        acc += jax.lax.dot_general(
            S[s],
            weighted[s],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


def spmm_pallas(
    plan: SpMMPlan, H: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """out = A @ H using the one-hot tiled kernel. H: [>= n_cols, P]."""
    if interpret is None:  # Mosaic only targets TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    rb, cb, be = plan.rb, plan.cb, plan.be
    ec = be // _SUB
    n_rows_pad = _round_up(plan.n_rows, rb)
    n_cols_pad = _round_up(plan.n_cols, cb)
    P = H.shape[1]
    if H.shape[0] != n_cols_pad:
        H = jnp.pad(H, ((0, n_cols_pad - H.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.num_groups,),
        in_specs=[
            pl.BlockSpec((_SUB, ec), lambda g, rbs, cbs: (g, 0)),
            pl.BlockSpec((_SUB, ec), lambda g, rbs, cbs: (g, 0)),
            pl.BlockSpec((_SUB, ec), lambda g, rbs, cbs: (g, 0)),
            pl.BlockSpec((cb, P), lambda g, rbs, cbs: (cbs[g], 0)),
        ],
        out_specs=pl.BlockSpec((rb, P), lambda g, rbs, cbs: (rbs[g], 0)),
    )
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, P), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.num_groups * be * (rb + cb) * P,
            bytes_accessed=plan.num_groups * (cb * P * 4 + 3 * be * 4),
            transcendentals=0,
        ),
    )(plan.tile_rb, plan.tile_cb, plan.lrow, plan.lcol, plan.val, H)
    return out[: plan.n_rows]
