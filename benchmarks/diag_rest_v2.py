"""On-chip A/B of hybrid-remainder strategies at the 2^20-node scale.

r3 attribution: the 49.6k-edge remainder costs ~4 ms of the 10.6 ms
1M-node hybrid aggregation (~80 ns/edge of HBM random access). The
candidate fix is COMPACTION: the remainder touches <=E unique output
rows, so sum per unique row first (compact segment-sum over ~50k rows)
and scatter once with sorted+unique indices, instead of scatter-adding
all E duplicate-row updates into the 2^20-row output.
"""
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph.datasets import powerlaw_node_classification
    from sgracex1_tpu.graph.normalize import sym_norm
    from sgracex1_tpu.graph.reorder import degree_order, permute_graph
    from sgracex1_tpu.ops.dispatch import split_by_tile_density

    n = 1 << 20
    data = powerlaw_node_classification(n=n, avg_degree=16, num_features=8, seed=0)
    A = sym_norm(data.edge_index, data.num_nodes)
    A, _ = permute_graph(A, degree_order(A))
    for tb, thresh in ((1024, 65), (1024, 200), (1024, 644)):
        part, rest = split_by_tile_density(A, tb, thresh)
        r = np.asarray(rest.rows[: rest.nnz])
        c = np.asarray(rest.cols[: rest.nnz])
        order = np.argsort(r, kind="stable")
        r, c = r[order], c[order]
        urows, seg = np.unique(r, return_inverse=True)
        U, E = len(urows), len(r)
        pr = np.asarray(part.rows[: part.nnz]).astype(np.int64)
        pc = np.asarray(part.cols[: part.nnz]).astype(np.int64)
        n_tiles = len(np.unique((pr // tb) * (1 << 32) + pc // tb))
        print(f"tb={tb} thresh={thresh}: rest={E} unique_rows={U} "
              f"part_tiles={n_tiles}", flush=True)
        cols_d = jax.device_put(jnp.asarray(c, jnp.int32))
        rows_d = jax.device_put(jnp.asarray(r, jnp.int32))
        seg_d = jax.device_put(jnp.asarray(seg, jnp.int32))
        urows_d = jax.device_put(jnp.asarray(urows, jnp.int32))
        H = jax.random.normal(jax.random.PRNGKey(0), (n, 128), jnp.float32)

        def bench(label, step, consts, k2=24):
            sec = timed_loop(step, H, consts=consts, iters=k2, k1=max(2, k2 // 6), reps=5)
            print(f"  {label}: {sec*1e3:.3f} ms ({E/sec/1e6:.1f} M edges/s)", flush=True)

        # A: current path — gather + duplicate-row scatter into h
        def cur(h, cols, rows):
            g = jnp.take(h, cols, axis=0)
            return h.at[rows].add(g, indices_are_sorted=True) * (1.0 - 1e-12)
        bench("A gather + dup scatter (current)", cur, (cols_d, rows_d))

        # B: gather + compact segment_sum + unique sorted scatter
        def compact_seg(h, cols, segi, ur):
            g = jnp.take(h, cols, axis=0)
            z = jax.ops.segment_sum(g, segi, num_segments=U, indices_are_sorted=True)
            return h.at[ur].add(z, indices_are_sorted=True, unique_indices=True) * (1.0 - 1e-12)
        bench("B gather + compact segsum + uniq scatter", compact_seg, (cols_d, seg_d, urows_d))

        # C: like B but compact combine via at[].add
        def compact_ata(h, cols, segi, ur):
            g = jnp.take(h, cols, axis=0)
            z = jnp.zeros((U, 128), h.dtype).at[segi].add(g, indices_are_sorted=True)
            return h.at[ur].add(z, indices_are_sorted=True, unique_indices=True) * (1.0 - 1e-12)
        bench("C gather + compact at[].add + uniq scatter", compact_ata, (cols_d, seg_d, urows_d))

        # D: gather only (floor)
        def g_only(h, cols):
            g = jnp.take(h, cols, axis=0)
            return h.at[:4096].add(g[:4096] * 1e-12)
        bench("D gather only", g_only, (cols_d,))

        # E: unique sorted scatter only (floor for the final scatter)
        Z0 = jax.random.normal(jax.random.PRNGKey(1), (U, 128), jnp.float32)
        def s_uniq(h, ur, z):
            return h.at[ur].add(z, indices_are_sorted=True, unique_indices=True) * (1.0 - 1e-12)
        bench("E uniq sorted scatter only", s_uniq, (urows_d, Z0))


if __name__ == "__main__":
    main()
