"""Headline benchmark: Citeseer 1-layer GNN forward D = A @ (X @ W).

Reference baseline: 4.65 ms on the RFSoC FPGA (1 FEA-thread / 1 ADJ-thread /
2 CUs, fp16) — jupyter/test/mmult-master.ipynb cell 34; see BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup factor over the 4.65 ms baseline.

Timing methodology: the TPU relay in this environment has ~25 ms round-trip
sync latency and async dispatch that `block_until_ready` does not fully
cover, so the op is iterated inside one jitted fori_loop with a data
dependence and synced once via host readback, at two iteration counts whose
difference divides out the per-call relay overhead (see timed_loop).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = 4.65  # FPGA citeseer 1t1t2c (BASELINE.md)
CITESEER = dict(N=3327, M=3703, P=32, NNZ_ADJ=12431, NNZ_FEA=105165)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_citeseer():
    from sgracex1_tpu.graph import io

    if io.reference_data_dir() is not None:
        adj, fea, w = io.load_reference_dataset("citeseer")
        return adj, np.asarray(fea.to_dense()), w
    # synthetic with identical dims/sparsity if reference data not mounted
    from sgracex1_tpu.graph.csr import SparseMatrix

    rng = np.random.default_rng(0)
    c = CITESEER
    r = rng.integers(0, c["N"], c["NNZ_ADJ"])
    cl = rng.integers(0, c["N"], c["NNZ_ADJ"])
    adj = SparseMatrix.from_coo(
        r, cl, rng.random(c["NNZ_ADJ"]).astype(np.float32), (c["N"], c["N"])
    )
    X = np.zeros((c["N"], c["M"]), np.float32)
    ri = rng.integers(0, c["N"], c["NNZ_FEA"])
    ci = rng.integers(0, c["M"], c["NNZ_FEA"])
    X[ri, ci] = 1.0
    w = rng.standard_normal((c["M"], c["P"])).astype(np.float32) * 0.1
    return adj, X, w


def timed_loop(step, init, consts=(), k1=400, k2=2400, reps=7):
    """Median wall time per iteration of `step`, amortized inside one jit.

    Two-point estimator: time a k1-iteration and a k2-iteration fori_loop
    and divide the difference by (k2 - k1). Both loops carry the same relay
    round-trip overhead, so it cancels; the iteration counts are large
    enough that (k2 - k1) * per_iter >> relay jitter (several ms), which a
    (k, 1)-point estimator at k=200 is not (measured spread 0.001-0.086 ms
    across identical runs; this estimator repeats to within ~2%).
    """
    import jax
    import jax.numpy as jnp

    def run(k):
        @jax.jit
        def f(x0, consts):
            # consts (adjacency, weights) enter as jit ARGUMENTS — closure
            # capture would embed them into the program sent to the remote
            # compiler (fails outright at large-graph sizes)
            return jax.lax.fori_loop(0, k, lambda i, x: step(x, *consts), x0)

        float(jnp.sum(f(init, consts)))  # compile + warm
        ts = []
        for _ in range(reps):
            t = time.time()
            float(jnp.sum(f(init, consts)))
            ts.append(time.time() - t)
        return np.median(ts)

    return (run(k2) - run(k1)) / (k2 - k1)


DEADLINE_S = 480.0  # overall benchmark deadline (hung-relay protection)


def main():
    import jax
    import jax.numpy as jnp

    from sgracex1_tpu.utils.watchdog import device_alive

    log("devices:", jax.devices())
    if not device_alive(60.0):
        log("ERROR: device liveness probe timed out (hung relay?); aborting")
        # os._exit: a stuck device call in a daemon thread aborts the
        # interpreter during normal teardown
        import os

        os._exit(1)
    adj, X, w = load_citeseer()
    adj = adj.device()
    X = jax.device_put(X)
    W = jax.device_put(w.astype(np.float32))

    from sgracex1_tpu.ops.dispatch import prepare_adjacency, agg_matmul

    prep = prepare_adjacency(adj, method="auto")
    log("aggregation backend:", prep.kind)
    X = X.astype(jnp.bfloat16)
    W = W.astype(jnp.bfloat16)

    def layer_step(x, prep, W):
        h = jnp.dot(x, W, preferred_element_type=jnp.float32)
        out = agg_matmul(prep, h.astype(jnp.bfloat16))
        # data dependence to stop loop-invariant hoisting: feed the output
        # back into the leading columns of x (slice update, not scatter)
        return x.at[:, : out.shape[1]].add(out.astype(x.dtype) * 1e-12)

    sec = timed_loop(layer_step, X, consts=(prep, W))
    ms = sec * 1000.0
    edges_per_s = CITESEER["NNZ_ADJ"] / sec
    log(f"citeseer layer fwd: {ms:.4f} ms  ({edges_per_s/1e6:.0f} M adj-edges/s)")
    print(
        json.dumps(
            dict(
                metric="citeseer_layer_fwd_ms",
                value=round(ms, 4),
                unit="ms",
                vs_baseline=round(BASELINE_MS / ms, 2),
            )
        )
    )


if __name__ == "__main__":
    from sgracex1_tpu.utils.watchdog import run_with_deadline, DeviceTimeout

    import os

    try:
        run_with_deadline(main, DEADLINE_S)
    except DeviceTimeout as e:
        log(f"ERROR: {e}")
        sys.stdout.flush()
        os._exit(1)
    sys.stdout.flush()  # os._exit skips buffered-stdout flushing
    os._exit(0)
