"""One-off diagnostic: where do the 1M-node prepare seconds and the
aggregation milliseconds actually go? (r3 investigation; see DESIGN.md §5)

Times every host prepare stage, then decomposes the hybrid aggregation:
bare tile kernel at tb=512 int8 / tb=1024 int8 / tb=1024 packed, the rest-
edge path, and the r1 scaling overhead (full agg vs bare kernel).
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.bsr import (
        bsr_bitmask_from_sparse,
        bsr_mask_from_sparse,
        bsr_spmm_pallas,
    )
    from sgracex1_tpu.ops.dispatch import (
        _estimate_backend_costs,
        agg_matmul,
        prepare_adjacency,
        split_by_tile_density,
    )
    from sgracex1_tpu.ops.spmm import spmm

    def t(label, fn):
        t0 = time.time()
        out = fn()
        print(f"  {label}: {time.time()-t0:.2f}s", flush=True)
        return out

    print("devices:", jax.devices(), flush=True)
    n = 1 << 20
    data = t("gen", lambda: powerlaw_node_classification(
        n=n, avg_degree=16, num_features=8, seed=0))
    A = t("sym_norm", lambda: sym_norm(data.edge_index, data.num_nodes))
    A, _ = t("degsort+permute", lambda: permute_graph(A, degree_order(A)))

    from sgracex1_tpu.graph.normalize import rank1_factor

    fac = t("rank1_factor", lambda: rank1_factor(A))
    costs, best_tb, best_hy = t("cost_est", lambda: _estimate_backend_costs(
        A, jnp.bfloat16, rank1=fac is not None))
    print("  costs:", {k: f"{v*1e3:.2f}ms" for k, v in costs.items()},
          "best_tb", best_tb, "best_hy", best_hy, flush=True)
    h_tb, h_thresh = best_hy
    part, rest = t("split_by_tile_density", lambda: split_by_tile_density(
        A, h_tb, h_thresh))
    print(f"  part nnz={part.nnz} rest nnz={rest.nnz}", flush=True)

    B512 = t("mask build fwd tb=512", lambda: jax.device_put(
        bsr_mask_from_sparse(part, tb=512, cover_rows=True, cover_cols=True)))
    Bt512 = t("mask build T tb=512", lambda: jax.device_put(
        bsr_mask_from_sparse(part.transpose(), tb=512, cover_rows=True,
                             cover_cols=True)))
    print(f"  tiles512: {B512.num_tiles}", flush=True)

    # tb=1024 splits (recompute split at 1024 with its own threshold)
    from sgracex1_tpu.ops.dispatch import _tile_cost_s, _tile_itemsize, _XLA_EDGE_S
    th1024 = int(np.ceil(_tile_cost_s(1024, _tile_itemsize(1024, True, 2))
                         / _XLA_EDGE_S))
    part1k, rest1k = t("split tb=1024", lambda: split_by_tile_density(
        A, 1024, th1024))
    print(f"  part1k nnz={part1k.nnz} rest1k nnz={rest1k.nnz} "
          f"thresh={th1024}", flush=True)
    B1k = t("mask build tb=1024 int8", lambda: jax.device_put(
        bsr_mask_from_sparse(part1k, tb=1024, cover_rows=True,
                             cover_cols=True)))
    P1k = t("packed build tb=1024", lambda: jax.device_put(
        bsr_bitmask_from_sparse(part1k, tb=1024, cover_rows=True,
                                cover_cols=True)))
    print(f"  tiles1k: {B1k.num_tiles} packed: {P1k.num_tiles}", flush=True)

    # full prepare for reference (the path bench.py takes)
    prep = t("prepare_adjacency(auto) [full]", lambda: prepare_adjacency(
        A, method="auto", dense_max_bytes=0))
    print(f"  prep kind={prep.kind} tb={prep.bsr.tb} tiles={prep.bsr.num_tiles}",
          flush=True)

    # ---- kernel sweep ----
    key = jax.random.PRNGKey(0)
    H = jax.random.normal(key, (A.n_cols, 128), jnp.float32)

    def bench(label, step, consts, nnz, k1=4, k2=24):
        sec = timed_loop(step, H, consts=consts, iters=k2, k1=k1, reps=5)
        print(f"  {label}: {sec*1e3:.3f} ms ({nnz/sec/1e6:.0f} M edges/s)",
              flush=True)
        return sec

    print("kernel sweep:", flush=True)
    bench("bare bsr tb=512 int8", lambda h, b: h + bsr_spmm_pallas(
        b, h)[: h.shape[0]] * 1e-12, (B512,), part.nnz)
    bench("bare bsr tb=1024 int8", lambda h, b: h + bsr_spmm_pallas(
        b, h)[: h.shape[0]] * 1e-12, (B1k,), part1k.nnz)
    bench("bare bsr tb=1024 packed", lambda h, b: h + bsr_spmm_pallas(
        b, h)[: h.shape[0]] * 1e-12, (P1k,), part1k.nnz)
    rest_d = jax.device_put(rest)
    bench("rest edges (xla)", lambda h, r: h + spmm(r, h) * 1e-12,
          (rest_d,), rest.nnz)
    bench("full agg_matmul (current)", lambda h, p: h + agg_matmul(
        p, h) * 1e-12, (prep,), A.nnz)

    # scaling overhead in isolation: Hs = H * col; out * row
    r1c = prep.r1_col
    r1r = prep.r1_row

    def scaled(h, b, rc, rr):
        hs = h * rc[: h.shape[0], None]
        o = bsr_spmm_pallas(b, hs)
        o = o * rr[: o.shape[0], None]
        return h + o[: h.shape[0]] * 1e-12

    bench("bsr512 + r1 scalings (no rest)", scaled, (B512, r1c, r1r),
          part.nnz)


if __name__ == "__main__":
    main()
