"""Reconcile the two citeseer headline regimes (VERDICT r1 item 2).

The fori_loop two-point estimator reuses ONE adjacency across iterations;
the citeseer working set (22 MB dense bf16 adjacency + 25 MB bf16 features)
fits in v5e VMEM, so steady-state iterations are compute-bound and beat the
HBM streaming floor (22+25 MB / 819 GB/s ~= 57 us) — physically impossible
for a cold call, which must stream the operands from HBM. This script
measures BOTH regimes with the same estimator:

- resident: the shipping bench loop (one adjacency, one X).
- streaming: K copies of the adjacency and X cycled by iteration index so
  aggregate working set >> VMEM and every iteration pays full HBM traffic.

The streaming number is the defensible per-call layer cost; the resident
number is the steady-state ceiling when XLA keeps operands on-chip (e.g.
multiple layers inside one jitted step reusing A).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import TwoPoint, load_citeseer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul
    from sgracex1_tpu.utils.roofline import cost_dense, CostModel

    def mark(msg):
        print(msg, file=sys.stderr, flush=True)

    mark("loading citeseer ...")
    adj, X, w = load_citeseer()
    adj = adj.device()
    Xd = jax.device_put(X).astype(jnp.bfloat16)
    W = jax.device_put(w.astype(np.float32)).astype(jnp.bfloat16)
    prep = prepare_adjacency(adj, method="dense")
    A = prep.dense
    n_pad = A.shape[0]
    print(f"A: {A.shape} {A.dtype} ({A.size * A.dtype.itemsize / 1e6:.1f} MB)"
          f"  X: {Xd.shape} ({Xd.size * 2 / 1e6:.1f} MB)", file=sys.stderr)

    # --- resident regime (the shipping bench loop) ---
    mark("compiling resident loops ...")

    def layer_step(x, A, W):
        h = jnp.dot(x, W, preferred_element_type=jnp.float32)
        out = jnp.dot(A, h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return x.at[:, : out.shape[1]].add(out.astype(x.dtype) * 1e-12)

    tp = TwoPoint(layer_step, Xd, consts=(A, W))
    res_ms = sorted(tp.estimate() * 1e3 for _ in range(5))
    print(f"resident:  median {np.median(res_ms):.4f} ms  "
          f"spread {res_ms[-1] - res_ms[0]:.4f}  {[f'{e:.4f}' for e in res_ms]}",
          flush=True)
    mark("building K-copy streaming operands ...")

    # --- streaming regime: K copies cycled so VMEM cannot hold them ---
    import time

    K = 8  # 8 * (22 + 25) MB = 376 MB aggregate >> 128 MB VMEM
    Astack = jnp.stack([A] * K)
    Xstack = jnp.stack([Xd] * K)

    def make_stream(k):
        @jax.jit
        def f(x0, Astack, Xstack, W):
            def body(i, x32):
                A_i = jax.lax.dynamic_index_in_dim(Astack, i % K,
                                                   keepdims=False)
                X_i = jax.lax.dynamic_index_in_dim(Xstack, i % K,
                                                   keepdims=False)
                x_full = X_i.at[:, : x32.shape[1]].add(x32 * 1e-12)
                h = jnp.dot(x_full, W, preferred_element_type=jnp.float32)
                out = jnp.dot(A_i, h.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                return x32 + out.astype(x32.dtype) * 1e-12

            return jax.lax.fori_loop(0, k, body, x0)

        return f

    # fewer iterations: each one now moves ~47 MB of HBM traffic
    k1, k2 = 50, 300
    f1, f2 = make_stream(k1), make_stream(k2)
    x0 = jnp.zeros((Xd.shape[0], W.shape[1]), jnp.bfloat16)
    mark("compiling streaming loops ...")
    for f in (f1, f2):  # compile + warm
        float(jnp.sum(f(x0, Astack, Xstack, W)))
    mark("timing streaming regime ...")

    def timed(f, reps=7):
        ts = []
        for _ in range(reps):
            t = time.time()
            float(jnp.sum(f(x0, Astack, Xstack, W)))
            ts.append(time.time() - t)
        return float(np.median(ts))

    str_ms = sorted(
        (timed(f2) - timed(f1)) / (k2 - k1) * 1e3 for _ in range(5)
    )
    med = float(np.median(str_ms))
    print(f"streaming: median {med:.4f} ms  "
          f"spread {str_ms[-1] - str_ms[0]:.4f}  {[f'{e:.4f}' for e in str_ms]}")

    # roofline attribution for the streaming number
    c = cost_dense(n_pad, W.shape[1]) + CostModel(
        flops=2.0 * Xd.shape[0] * Xd.shape[1] * W.shape[1],
        hbm_bytes=float(Xd.size * 2), note="feature-matmul")
    print("streaming roofline:", c.fmt(med / 1e3))
    print("resident  roofline:", c.fmt(float(np.median(res_ms)) / 1e3),
          "(>100% HBM == operands are VMEM-resident)")


if __name__ == "__main__":
    main()
