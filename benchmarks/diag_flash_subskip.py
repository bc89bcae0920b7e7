"""On-chip A/B: flash-GAT sub-block occupancy skipping vs the plain
kernel (r3 verdict #4) on pubmed (RCM, tb=1024, int8 mask tiles).

At pubmed only ~56% of 128x128 sub-blocks hold an edge; the subskip
kernel predicates the score math per sub-block (64 scalar branches per
tile). The open question is whether the saved VPU work beats the branch
overhead + smaller-op efficiency loss."""

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from benchmarks.common import timed_loop
    from sgracex1_tpu.graph import io
    from sgracex1_tpu.graph.reorder import rcm_order, permute_graph
    from sgracex1_tpu.ops.bsr import bsr_mask_from_sparse
    from sgracex1_tpu.ops.flash_gat import (
        flash_gat_forward,
        flash_gat_forward_subskip,
        subblock_pop_bitmap,
    )

    adj, _, _ = io.load_reference_dataset("pubmed")
    adj, _ = permute_graph(adj, rcm_order(adj))
    rng = np.random.default_rng(0)
    N, F = adj.n_rows, 32
    Wh = jax.device_put(rng.standard_normal((N, F)).astype(np.float32))
    s1 = jax.device_put(rng.standard_normal(N).astype(np.float32))
    s2 = jax.device_put(rng.standard_normal(N).astype(np.float32))
    B = bsr_mask_from_sparse(adj, tb=1024)

    def base_step(wh, B, s1, s2):
        o = flash_gat_forward(B, s1, s2, wh)
        return wh + o[: wh.shape[0]] * 1e-12

    sec = timed_loop(base_step, Wh, consts=(B, s1, s2), iters=600, k1=100)
    print(f"plain tb=1024 int8: {sec*1e3:.4f} ms "
          f"({adj.nnz/sec/1e6:.0f} M edges/s)", flush=True)

    for sb in (128, 256):
        pop = subblock_pop_bitmap(B, adj, sb=sb)
        bits = int(sum(bin(int(w)).count("1") for row in pop for w in row))
        tot = B.num_tiles * (1024 // sb) ** 2
        popd = jax.device_put(jnp.asarray(pop))

        def skip_step(wh, B, popd, s1, s2):
            o = flash_gat_forward_subskip(B, popd, s1, s2, wh, sb=sb)
            return wh + o[: wh.shape[0]] * 1e-12

        sec_s = timed_loop(
            skip_step, Wh, consts=(B, popd, s1, s2), iters=600, k1=100
        )
        print(
            f"subskip sb={sb}: {sec_s*1e3:.4f} ms "
            f"({adj.nnz/sec_s/1e6:.0f} M edges/s; occupancy "
            f"{bits}/{tot} = {100*bits/tot:.0f}%)",
            flush=True,
        )
        # parity spot check
        ref = np.asarray(flash_gat_forward(B, s1, s2, Wh))
        got = np.asarray(flash_gat_forward_subskip(B, popd, s1, s2, Wh, sb=sb))
        print(f"  max err vs plain: {np.abs(got - ref).max():.5f}", flush=True)


if __name__ == "__main__":
    main()
