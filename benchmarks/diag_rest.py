import time
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
    part, rest = split_by_tile_density(A, 512, 113)
    print("rest nnz:", rest.nnz, "rows span:", np.asarray(rest.rows[:rest.nnz]).min(),
          np.asarray(rest.rows[:rest.nnz]).max(), flush=True)
    r = jax.device_put(rest)
    H = jax.random.normal(jax.random.PRNGKey(0), (n, 128), jnp.float32)
    out0 = jax.random.normal(jax.random.PRNGKey(1), (n, 128), jnp.float32)

    def bench(label, step, consts, k1=4, k2=24):
        sec = timed_loop(step, H, consts=consts, iters=k2, k1=k1, reps=5)
        print(f"  {label}: {sec*1e3:.3f} ms ({rest.nnz/sec/1e6:.1f} M edges/s)", flush=True)

    # gather only
    def g_only(h, r):
        w = jnp.take(h, r.cols, axis=0) * r.vals[:, None]
        k = 4096
        return h.at[:k, :].add(w[:k] * 1e-12)
    bench("gather only", g_only, (r,))

    # scatter only (weights precomputed outside the timed loop? no - keep fair: scatter of a fixed array)
    W = jnp.take(H, r.cols, axis=0) * r.vals[:, None]
    def s_only(h, r, w):
        o = h.at[r.rows].add(w, indices_are_sorted=True)
        return o * (1.0 - 1e-12)
    bench("scatter only (sorted rows)", s_only, (r, W))

    def seg_only(h, r, w):
        o = jax.ops.segment_sum(w, r.rows, num_segments=h.shape[0], indices_are_sorted=True)
        return h + o * 1e-12
    bench("segment_sum only", seg_only, (r, W))

    # full path
    from sgracex1_tpu.ops.spmm import spmm_into
    def full(h, r, o0):
        return h + spmm_into(r, h, o0)[: h.shape[0]] * 1e-12
    bench("full spmm_into", full, (r, out0))

if __name__ == "__main__":
    main()
