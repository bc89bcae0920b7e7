"""Distributed local-block aggregation at SINGLE-CHIP tile generation.

r3's ``build_halo_bsr`` stacked host-built f32 value tiles — a generation
behind the single-chip pipeline (no mask/packed formats, no rank-1
factorization, no fused remainder), and tens of GB of host tiles at the
2^22-node scale. This module gives each shard's LOCAL adjacency block the
full single-chip treatment instead:

- hybrid density split per shard (dense tiles + remainder chunks);
- int8 {0,1} mask or 1-bit packed mask tiles under a rank-1
  factorization — the GLOBAL factorization restricted to the shard's
  rows/columns is exact for the local block (A[s,s] = D_s M_ss D_s);
- the fully-fused kernel schedule (ops/fused_agg) per direction, so the
  local aggregation runs the same one-pass kernel as the single-chip
  path, forward and backward.

Remote (boundary) edges keep the halo all_to_all + segment-sum path from
parallel/halo.py — after LPT/RCM partitioning they are the sparse tail,
exactly what the edge path is for.

Build note: per-shard plans are built host-side (``device=False``) and
stacked into [S, ...] arrays with one ``jax.device_put(plan, sharding)``
at the end — sized for the virtual CPU mesh this environment tests on
and for a real multi-chip device_put alike.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sgracex1_tpu.graph.csr import SparseMatrix
from sgracex1_tpu.ops.bsr import (
    BSRMatrix,
    bsr_bitmask_from_sparse,
    bsr_mask_from_sparse,
    bsr_from_sparse,
    bsr_tile_keys,
)
from sgracex1_tpu.ops.dispatch import (
    _drop_zero_val_edges,
    _tile_cost_s,
    _tile_itemsize,
    _REST_CHUNK_S,
    _REST_K,
    _REST_SLOT_S,
    split_by_tile_density,
)
from sgracex1_tpu.ops.fused_agg import FusedAggPlan, build_fused_plan
from sgracex1_tpu.ops.fused_gnn import relu_hw
from sgracex1_tpu.parallel.halo import HaloGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloFusedPlan:
    """Stacked per-shard fused schedules (fwd + transposed) for the local
    blocks. Every array leaf has a leading shard axis [S, ...]; shapes
    are padded to per-shard maxima (zero tiles / dead chunks / no-op pad
    steps — see _stack_plans)."""

    tiles: jax.Array  # [S, T, tb, inner]
    step_rb: jax.Array  # int32[S, S_steps+1]
    step_cb: jax.Array
    step_tile: jax.Array
    step_chunk: jax.Array
    step_kind: jax.Array
    lrow: jax.Array  # f32[S, R, 8, K]
    slot_col: jax.Array  # int32[S, R*K]
    slot_scale: jax.Array  # f32[S, R*K]
    colscale: Optional[jax.Array]  # f32[S, n_ct, tb]
    rowscale: Optional[jax.Array]
    tiles_t: jax.Array
    step_rb_t: jax.Array
    step_cb_t: jax.Array
    step_tile_t: jax.Array
    step_chunk_t: jax.Array
    step_kind_t: jax.Array
    lrow_t: jax.Array
    slot_col_t: jax.Array
    slot_scale_t: jax.Array
    colscale_t: Optional[jax.Array]
    rowscale_t: Optional[jax.Array]
    tb: int = dataclasses.field(metadata=dict(static=True))
    K: int = dataclasses.field(metadata=dict(static=True))
    n_local: int = dataclasses.field(metadata=dict(static=True))


def _shard_plan_pair(
    A_l: SparseMatrix, tb: int, K: int, fac
) -> Tuple[FusedAggPlan, FusedAggPlan, int]:
    """One shard's (fwd, bwd) host-side fused plans + its rest edge count."""
    itemsize = _tile_itemsize(tb, fac is not None, 2)
    thresh = int(
        np.ceil(
            _tile_cost_s(tb, itemsize)
            / (_REST_SLOT_S + _REST_CHUNK_S / _REST_K)
        )
    )
    part, rest = split_by_tile_density(A_l, tb, thresh)
    if fac is not None and rest.nnz:
        rest = _drop_zero_val_edges(rest)
    rest_m = rest if rest.nnz else None
    part_t = part.transpose()
    if fac is not None:
        if itemsize < 1:
            B = bsr_bitmask_from_sparse(
                part, tb=tb, cover_rows=True, cover_cols=True,
                device_build=False,
            )
            Bt = bsr_bitmask_from_sparse(
                part_t, tb=tb, cover_rows=True, cover_cols=True,
                device_build=False,
            )
        else:
            B = bsr_mask_from_sparse(
                part, tb=tb, cover_rows=True, cover_cols=True,
                device_build=False,
            )
            Bt = bsr_mask_from_sparse(
                part_t, tb=tb, cover_rows=True, cover_cols=True,
                device_build=False,
            )
        r1r, r1c = fac
    else:
        B = bsr_from_sparse(
            part, tb=tb, dtype=jnp.bfloat16, cover_rows=True,
            cover_cols=True, device_build=False,
        )
        Bt = bsr_from_sparse(
            part_t, tb=tb, dtype=jnp.bfloat16, cover_rows=True,
            cover_cols=True, device_build=False,
        )
        r1r = r1c = None
    plan = build_fused_plan(
        B, rest_m, r1_row=r1r, r1_col=r1c, K=K,
        tile_keys=bsr_tile_keys(part, tb, cover_rows=True, cover_cols=True),
        device=False, attach_chunks=True,
    )
    plan_t = build_fused_plan(
        Bt,
        rest_m.transpose() if rest_m is not None else None,
        r1_row=r1c, r1_col=r1r, K=K,
        tile_keys=bsr_tile_keys(
            part_t, tb, cover_rows=True, cover_cols=True
        ),
        device=False, attach_chunks=True,
    )
    return plan, plan_t, int(rest.nnz)


def _stack_plans(plans, tb: int, K: int):
    """Stack host-side FusedAggPlans into uniform [S, ...] arrays.

    Padding invariants (all no-ops under the kernel semantics):
    - tiles pad with zeros; T_stack = max_T + 1 guarantees every shard
      has an all-zero tile at index T_s to point pad steps at;
    - pad steps are TILE steps on that zero tile, repeating the last real
      step's rb/cb/chunk — they accumulate 0 and, because they extend the
      final rb run, simply move the 'last' write (and row scaling) to the
      final pad step;
    - dead chunks pad lrow with the sentinel (tb) and slots with zeros;
    - plans whose auto-chosen chunk width is below ``K`` widen with dead
      slots per chunk (the slot layout is [R, K]).
    """
    S_steps = max(p.num_steps for p in plans)
    T_stack = max(p.B.tiles.shape[0] for p in plans) + 1
    R_stack = max(p.num_chunks for p in plans)
    inner = plans[0].B.tiles.shape[-1]
    tile_dtype = plans[0].B.tiles.dtype

    out = {k: [] for k in (
        "step_rb", "step_cb", "step_tile", "step_chunk",
        "step_kind", "lrow", "slot_col", "slot_scale", "colscale",
        "rowscale",
    )}
    with_scales = plans[0].colscale is not None
    # tiles: preallocate the stacked array once and fill per shard —
    # np.stack of a list of multi-GB padded copies doubled the build time
    n_sh = len(plans)
    tiles_stacked = np.zeros(
        (n_sh, T_stack, tb, inner), np.asarray(plans[0].B.tiles).dtype
    )
    for si, p in enumerate(plans):
        T = p.B.tiles.shape[0]
        tiles_stacked[si, :T] = np.asarray(p.B.tiles)
    for p in plans:
        T = p.B.tiles.shape[0]
        S = p.num_steps
        pad = S_steps - S
        rb = np.concatenate([
            p.step_rb[:S], np.full(pad, p.step_rb[S - 1], np.int32),
            [p.step_rb[S]],
        ]).astype(np.int32)
        out["step_rb"].append(rb)
        out["step_cb"].append(np.concatenate(
            [p.step_cb, np.full(pad, p.step_cb[-1])]
        ).astype(np.int32))
        # pad steps point at the shard's first zero pad tile (index T)
        out["step_tile"].append(np.concatenate(
            [p.step_tile, np.full(pad, T)]
        ).astype(np.int32))
        out["step_chunk"].append(np.concatenate(
            [p.step_chunk, np.full(pad, p.step_chunk[-1])]
        ).astype(np.int32))
        out["step_kind"].append(np.concatenate(
            [p.step_kind, np.zeros(pad)]
        ).astype(np.int32))
        R = p.num_chunks
        Kp = p.K
        assert Kp <= K, (Kp, K)
        lrow = np.full((R_stack, 8, K), float(tb), np.float32)
        lrow[:R, :, :Kp] = p.lrow
        out["lrow"].append(lrow)
        sc = np.zeros((R_stack, K), np.int32)
        sc[:R, :Kp] = np.asarray(p.slot_col).reshape(R, Kp)
        out["slot_col"].append(sc.reshape(R_stack * K))
        ss = np.zeros((R_stack, K), np.float32)
        ss[:R, :Kp] = np.asarray(p.slot_scale).reshape(R, Kp)
        out["slot_scale"].append(ss.reshape(R_stack * K))
        if with_scales:
            out["colscale"].append(np.asarray(p.colscale))
            out["rowscale"].append(np.asarray(p.rowscale))
    stacked = {k: np.stack(v) for k, v in out.items() if v}
    stacked["tiles"] = tiles_stacked
    if not with_scales:
        stacked["colscale"] = None
        stacked["rowscale"] = None
    return stacked


def _choose_shard_tb(A_ls, rank1: bool, tbs=(256, 512, 1024)) -> int:
    """Tile size for the per-shard local blocks, by the SAME calibrated
    hybrid cost constants the single-chip path uses, summed over every
    shard's actual tile population. Per-shard local blocks have S-fold
    fewer rows than the global graph, so the optimal tb is generally
    smaller than the single-chip choice (VERDICT r4 weak #5: nothing
    chose it before — tb was hardcoded 1024). Inlined (one np.unique
    per (shard, tb)) — routing through _estimate_backend_costs redid
    the dense/xla/pallas terms per call, ~4x the host work at 2^22."""
    tots = {tb: 0.0 for tb in tbs}
    for A_l in A_ls:
        r = np.asarray(A_l.rows[: A_l.nnz]).astype(np.int64)
        c = np.asarray(A_l.cols[: A_l.nnz]).astype(np.int64)
        for tb in tbs:
            uniq, counts = np.unique(
                (r // tb) << 32 | (c // tb), return_counts=True
            )
            if len(counts) == 0:
                continue
            tc = _tile_cost_s(tb, _tile_itemsize(tb, rank1, 2))
            thresh = int(np.ceil(
                tc / (_REST_SLOT_S + _REST_CHUNK_S / _REST_K)
            ))
            dense = counts >= thresh
            rest_by_rb = np.bincount(
                (uniq >> 32)[~dense].astype(np.int64),
                weights=counts[~dense].astype(np.float64),
            )
            tots[tb] += (
                int(dense.sum()) * tc
                + np.ceil(rest_by_rb / _REST_K).sum() * _REST_CHUNK_S
                + counts[~dense].sum() * _REST_SLOT_S
            )
    return min(tots, key=tots.get)


def build_halo_fused(
    G: HaloGraph,
    *,
    tb: int | str = "auto",
    K: int | None = None,
    rank1_factors=None,
    threads: int | None = None,
) -> HaloFusedPlan:
    """Per-shard fused plans for the local blocks of a HaloGraph.

    ``rank1_factors``: the GLOBAL (s_row, s_col) from
    graph/normalize.rank1_factor on the whole adjacency (detected by the
    caller, e.g. once before partitioning); sliced per shard here. When
    None, per-shard detection is attempted (exact spanning-forest solve)
    — and forced to a COMMON mode across shards: one shard detecting no
    factorization (e.g. a local block with no positive edges) while
    others do would stack mask tiles next to value tiles, silently
    corrupting the mask shards' output (r4 advisor finding).

    ``tb="auto"`` picks the tile size by the calibrated cost model over
    all shards (_choose_shard_tb); ``K=None`` lets each per-shard plan
    pick its chunk width, unified to the max by the stacker. The S shard
    plan pairs build concurrently (``threads``, default min(S, 8) —
    the numpy sort/unique work releases the GIL in stretches)."""
    import concurrent.futures as cf

    S, n_local = G.n_shards, G.n_local
    A_ls, facs = [], []
    for s in range(S):
        r = np.asarray(G.rows_loc[s])
        c = np.asarray(G.cols_loc[s])
        v = np.asarray(G.vals_loc[s], dtype=np.float32)
        keep = v != 0  # padding slots (and fill=0 loops): zero contribution
        A_l = SparseMatrix.from_coo(
            r[keep], c[keep], v[keep], (n_local, n_local)
        )
        A_ls.append(A_l)
        if rank1_factors is not None:
            sl = slice(s * n_local, (s + 1) * n_local)
            rr = np.ones(n_local, np.float32)
            cc = np.ones(n_local, np.float32)
            src = np.asarray(rank1_factors[0], np.float32)[sl]
            rr[: len(src)] = src
            dst = np.asarray(rank1_factors[1], np.float32)[sl]
            cc[: len(dst)] = dst
            facs.append((rr, cc))
        else:
            from sgracex1_tpu.graph.normalize import rank1_factor

            facs.append(rank1_factor(A_l))
    if any(f is None for f in facs) and any(f is not None for f in facs):
        # mode uniformity: degrade every shard to value tiles
        facs = [None] * S
    rank1 = facs[0] is not None
    if tb == "auto":
        tb = _choose_shard_tb(A_ls, rank1)

    if threads is None:
        threads = min(S, 8)
    with cf.ThreadPoolExecutor(max_workers=max(threads, 1)) as ex:
        pairs = list(ex.map(
            lambda af: _shard_plan_pair(af[0], tb, K, af[1]),
            zip(A_ls, facs),
        ))
    plans_f = [p for p, _, _ in pairs]
    plans_b = [pt for _, pt, _ in pairs]
    K_uni = max(p.K for p in plans_f + plans_b) if K is None else K

    fwd = _stack_plans(plans_f, tb, K_uni)
    bwd = _stack_plans(plans_b, tb, K_uni)
    K = K_uni
    return HaloFusedPlan(
        tiles=jnp.asarray(fwd["tiles"]),
        step_rb=jnp.asarray(fwd["step_rb"]),
        step_cb=jnp.asarray(fwd["step_cb"]),
        step_tile=jnp.asarray(fwd["step_tile"]),
        step_chunk=jnp.asarray(fwd["step_chunk"]),
        step_kind=jnp.asarray(fwd["step_kind"]),
        lrow=jnp.asarray(fwd["lrow"]),
        slot_col=jnp.asarray(fwd["slot_col"]),
        slot_scale=jnp.asarray(fwd["slot_scale"]),
        colscale=(
            jnp.asarray(fwd["colscale"])
            if fwd["colscale"] is not None else None
        ),
        rowscale=(
            jnp.asarray(fwd["rowscale"])
            if fwd["rowscale"] is not None else None
        ),
        tiles_t=jnp.asarray(bwd["tiles"]),
        step_rb_t=jnp.asarray(bwd["step_rb"]),
        step_cb_t=jnp.asarray(bwd["step_cb"]),
        step_tile_t=jnp.asarray(bwd["step_tile"]),
        step_chunk_t=jnp.asarray(bwd["step_chunk"]),
        step_kind_t=jnp.asarray(bwd["step_kind"]),
        lrow_t=jnp.asarray(bwd["lrow"]),
        slot_col_t=jnp.asarray(bwd["slot_col"]),
        slot_scale_t=jnp.asarray(bwd["slot_scale"]),
        colscale_t=(
            jnp.asarray(bwd["colscale"])
            if bwd["colscale"] is not None else None
        ),
        rowscale_t=(
            jnp.asarray(bwd["rowscale"])
            if bwd["rowscale"] is not None else None
        ),
        tb=tb,
        K=K,
        n_local=n_local,
    )


def _local_plan(FP: "HaloFusedPlan", transposed: bool) -> FusedAggPlan:
    """Rebuild one shard's FusedAggPlan from the [0]-sliced stacked leaves
    (call INSIDE shard_map). tile_rb/tile_cb are unused by the fused
    kernel — zeros keep the BSRMatrix container valid."""
    sfx = "_t" if transposed else ""
    g = lambda name: getattr(FP, name + sfx)
    tiles = g("tiles")
    T = tiles.shape[0]
    B = BSRMatrix(
        tiles=tiles,
        tile_rb=jnp.zeros(T, jnp.int32),
        tile_cb=jnp.zeros(T, jnp.int32),
        n_rows=FP.n_local,
        n_cols=FP.n_local,
        tb=FP.tb,
    )
    return FusedAggPlan(
        B=B,
        step_rb=g("step_rb"),
        step_cb=g("step_cb"),
        step_tile=g("step_tile"),
        step_chunk=g("step_chunk"),
        step_kind=g("step_kind"),
        lrow=g("lrow"),
        slot_col=g("slot_col"),
        slot_scale=g("slot_scale"),
        colscale=g("colscale"),
        rowscale=g("rowscale"),
        K=FP.K,
    )


def dist_spmm_halo_fused(
    mesh: Mesh, G: HaloGraph, FP: HaloFusedPlan, H: jax.Array
) -> jax.Array:
    """out = A @ H: local block on the fused one-pass kernel (packed
    mask tiles + remainder chunks + rank-1 scalings), boundary edges via
    all_to_all + segment-sum. Differentiable (the fused custom-VJP runs
    the transposed schedule; autodiff transposes the all_to_all)."""
    from sgracex1_tpu.ops.dispatch import _fused_agg

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            (P("graph", None),) * 3
            + (P("graph", None, None), P("graph"))
            + (P("graph", None),)
        ),
        out_specs=P("graph", None),
        check_vma=False,  # pallas_call out_shape carries no vma annotation
    )
    def f(rows_rem, cols_halo, vals_rem, send_idx, FP_g, H_l):
        rows_rem, cols_halo, vals_rem = rows_rem[0], cols_halo[0], vals_rem[0]
        send_idx = send_idx[0]
        FP_l = jax.tree.map(lambda a: a[0], FP_g)

        send = jnp.take(H_l, send_idx.reshape(-1), axis=0).reshape(
            send_idx.shape + (H_l.shape[1],)
        )
        halo = jax.lax.all_to_all(
            send, "graph", split_axis=0, concat_axis=0, tiled=False
        ).reshape(-1, H_l.shape[1])

        plan = _local_plan(FP_l, False)
        plan_t = _local_plan(FP_l, True)
        out = _fused_agg(plan, plan_t, H_l)[: FP.n_local].astype(H_l.dtype)
        out = out + jax.ops.segment_sum(
            jnp.take(halo, cols_halo, axis=0) * vals_rem[:, None],
            rows_rem,
            num_segments=FP.n_local,
        ).astype(H_l.dtype)
        return out

    return f(
        G.rows_rem, G.cols_halo, G.vals_rem, G.send_idx, FP, H
    )


def dist_gnn_layer_halo_fused(
    mesh: Mesh,
    G: HaloGraph,
    FP: HaloFusedPlan,
    x: jax.Array,
    W: jax.Array,
    *,
    relu: bool = False,
) -> jax.Array:
    """GCN layer ReLU?(A @ (X @ W)) with the local block on the fused
    single-pass kernel."""
    H = jnp.dot(x, W, preferred_element_type=jnp.float32)
    out = dist_spmm_halo_fused(mesh, G, FP, H)
    return relu_hw(out) if relu else out
