"""r3 follow-up diagnostic: rowloop kernel + scatter-into rest path at 1M.

Run as ``python -m benchmarks.diag_1m_rowloop``.
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
        bsr_spmm_rowloop,
    )
    from sgracex1_tpu.ops.dispatch import (
        agg_matmul,
        prepare_adjacency,
        split_by_tile_density,
        _tile_cost_s,
        _tile_itemsize,
        _XLA_EDGE_S,
    )
    from sgracex1_tpu.ops.spmm import spmm_into

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    n = 1 << 20
    data = powerlaw_node_classification(n=n, avg_degree=16, num_features=8,
                                        seed=0)
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    print(f"graph ready {time.time()-t0:.1f}s nnz={A.nnz}", flush=True)

    t0 = time.time()
    prep = prepare_adjacency(A, method="auto", dense_max_bytes=0)
    print(f"prepare(auto): {time.time()-t0:.1f}s kind={prep.kind} "
          f"tb={prep.bsr.tb} tiles={prep.bsr.num_tiles}", flush=True)

    th1024 = int(np.ceil(_tile_cost_s(1024, _tile_itemsize(1024, True, 2))
                         / _XLA_EDGE_S))
    part1k, rest1k = split_by_tile_density(A, 1024, th1024)
    t0 = time.time()
    B1k = jax.device_put(bsr_mask_from_sparse(
        part1k, tb=1024, cover_rows=True, cover_cols=True))
    P1k = jax.device_put(bsr_bitmask_from_sparse(
        part1k, tb=1024, cover_rows=True, cover_cols=True))
    print(f"1024 builds: {time.time()-t0:.1f}s tiles={B1k.num_tiles}",
          flush=True)

    key = jax.random.PRNGKey(0)
    H = jax.random.normal(key, (A.n_cols, 128), jnp.float32)

    def bench(label, step, consts, nnz, k1=4, k2=24):
        sec = timed_loop(step, H, consts=consts, iters=k2, k1=k1, reps=5)
        print(f"  {label}: {sec*1e3:.3f} ms ({nnz/sec/1e6:.0f} M edges/s)",
              flush=True)
        return sec

    B512, rest = prep.bsr, prep.rest
    print("kernel sweep:", flush=True)
    bench("rowloop tb=512 int8", lambda h, b: h + bsr_spmm_rowloop(
        b, h)[: h.shape[0]] * 1e-12, (B512,), A.nnz)
    bench("rowloop tb=1024 int8", lambda h, b: h + bsr_spmm_rowloop(
        b, h)[: h.shape[0]] * 1e-12, (B1k,), A.nnz)
    bench("rowloop tb=1024 packed", lambda h, b: h + bsr_spmm_rowloop(
        b, h)[: h.shape[0]] * 1e-12, (P1k,), A.nnz)
    bench("gridstep tb=1024 packed (old)", lambda h, b: h + bsr_spmm_pallas(
        b, h)[: h.shape[0]] * 1e-12, (P1k,), A.nnz)

    if rest is not None:
        def rest_into(h, r, b):
            o = bsr_spmm_rowloop(b, h)[: h.shape[0]]
            o = spmm_into(r, h, o)
            return h + o * 1e-12

        bench("rowloop512 + rest scatter-into", rest_into, (rest, B512),
              A.nnz)
    bench("full agg_matmul (spmm_into fix)", lambda h, p: h + agg_matmul(
        p, h) * 1e-12, (prep,), A.nnz)


if __name__ == "__main__":
    main()
