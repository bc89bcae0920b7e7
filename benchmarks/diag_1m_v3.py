"""r3: rest-scatter placement, plane-matmul unpack, tb=2048 — on-chip."""

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
        bsr_spmm_pallas,
    )
    from sgracex1_tpu.ops.dispatch import (
        _estimate_backend_costs,
        prepare_adjacency,
        split_by_tile_density,
        _tile_cost_s,
        _tile_itemsize,
        _XLA_EDGE_S,
    )

    print("devices:", jax.devices(), flush=True)
    n = 1 << 20
    data = powerlaw_node_classification(n=n, avg_degree=16, num_features=8,
                                        seed=0)
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    print(f"graph ready nnz={A.nnz}", flush=True)

    costs, best_tb, best_hy = _estimate_backend_costs(
        A, jnp.bfloat16, tbs=(128, 256, 512, 1024, 2048), rank1=True)
    print("costs w/ tb=2048 option:", {k: f"{v*1e3:.2f}ms"
          for k, v in costs.items()}, "best_hy", best_hy, flush=True)

    prep = prepare_adjacency(A, method="auto", dense_max_bytes=0)
    print(f"prep: tb={prep.bsr.tb} tiles={prep.bsr.num_tiles} "
          f"rest={prep.rest.nnz}", flush=True)

    key = jax.random.PRNGKey(0)
    H = jax.random.normal(key, (A.n_cols, 128), jnp.float32)

    def bench(label, step, consts, k1=4, k2=24):
        sec = timed_loop(step, H, consts=consts, iters=k2, k1=k1, reps=5)
        print(f"  {label}: {sec*1e3:.3f} ms ({A.nnz/sec/1e6:.0f} M edges/s)",
              flush=True)
        return sec

    B, rest, r1r, r1c = prep.bsr, prep.rest, prep.r1_row, prep.r1_col
    nr = A.n_rows

    # V2: rest scatter BEFORE row scaling, unit mask-space vals
    def v2(h, B, rest, r1r, r1c):
        hs = h * r1c[: h.shape[0], None]
        o = bsr_spmm_pallas(B, hs)
        o = o.at[rest.rows].add(
            jnp.take(hs, rest.cols, axis=0), indices_are_sorted=True
        )
        out = o[:nr] * r1r[:, None]
        return h + out * 1e-12

    bench("V2 rest-before-rowscale (unit vals)", v2, (B, rest, r1r, r1c))

    # V2b: same but scatter after slicing (copy risk probe)
    def v2b(h, B, rest, r1r, r1c):
        hs = h * r1c[: h.shape[0], None]
        o = bsr_spmm_pallas(B, hs)[:nr]
        o = o.at[rest.rows].add(
            jnp.take(hs, rest.cols, axis=0), indices_are_sorted=True
        )
        return h + o * r1r[:, None] * 1e-12

    bench("V2b scatter-after-slice", v2b, (B, rest, r1r, r1c))

    # V6: tb=2048 packed
    th2k = int(np.ceil(_tile_cost_s(2048, _tile_itemsize(2048, True, 2))
                       / _XLA_EDGE_S))
    part2k, rest2k = split_by_tile_density(A, 2048, th2k)
    t0 = time.time()
    B2k = jax.device_put(bsr_bitmask_from_sparse(
        part2k, tb=2048, cover_rows=True, cover_cols=True))
    print(f"  2048 build {time.time()-t0:.1f}s tiles={B2k.num_tiles} "
          f"rest2k={rest2k.nnz} thresh={th2k}", flush=True)
    bench("V6 bare tb=2048 packed", lambda h, b: h + bsr_spmm_pallas(
        b, h)[: h.shape[0]] * 1e-12, (B2k,))


if __name__ == "__main__":
    main()
