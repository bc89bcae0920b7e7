"""Quantized inference benchmark: full-integer int8 2-layer GCN vs the bf16
and f32 dense paths — the MXU payoff the reference's int datapath targets."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timed_loop, load, header
from sgracex1_tpu.quant.calibration import CalibrationTable
from sgracex1_tpu.quant import int8 as qi8
from sgracex1_tpu.utils.transfer import chunked_device_put


def main(dataset: str = "cora"):
    rng = np.random.default_rng(0)
    adj, X, W1 = load(dataset)
    A = adj.to_dense().astype(np.float32)
    A /= np.maximum(A.sum(1, keepdims=True), 1)
    h = W1.shape[1]
    W2 = rng.uniform(-0.5, 0.5, (h, h)).astype(np.float32)

    n = X.shape[0]
    print(f"{dataset}: N={n} F={X.shape[1]} hidden={h}")

    # float paths
    for dtype, label in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
        Ad = chunked_device_put(A.astype(dtype))
        Xd = jax.device_put(X.astype(dtype))
        W1d, W2d = jax.device_put(W1.astype(dtype)), jax.device_put(W2.astype(dtype))

        def fwd(xv):
            h1 = jnp.maximum(
                jnp.dot(Ad, jnp.dot(xv, W1d, preferred_element_type=jnp.float32).astype(dtype),
                        preferred_element_type=jnp.float32), 0.0).astype(dtype)
            out = jnp.dot(Ad, jnp.dot(h1, W2d, preferred_element_type=jnp.float32).astype(dtype),
                          preferred_element_type=jnp.float32)
            # matrix-shaped data dependence: a scalar-sum feedback is
            # foldable/hoistable and XLA has been caught eliding it
            return xv.at[:, : out.shape[1]].add(out.astype(dtype) * 1e-12)

        # ~10-30 us ops need ~8000 amortized iterations: the two-point
        # median jitter through the relay is a few ms, so at iters<=1000
        # the estimate error is comparable to the op itself (observed r3:
        # negative timings at 50, an impossible 245 TF/s at 1000)
        sec = timed_loop(fwd, Xd, iters=8000)
        print(f"  {label} dense 2-layer fwd {sec * 1e3:8.4f} ms")

    # int8 path
    am = qi8.collect_amax_gcn2(A, X, W1, W2)
    cal = CalibrationTable.for_qbits(
        8,
        dict(w_min=-1.0, w_max=1.0, w_min2=-0.5, w_max2=0.5,
             f_min=0.0, f_max=float(X.max()), a_min=0.0, a_max=float(A.max())),
    )
    net = qi8.freeze_gcn2(W1, W2, A, cal, **am)
    net = jax.device_put(net)
    xs = jax.device_put(qi8.quantize_unsigned_shifted(jnp.asarray(X), cal.features))

    def fwd_i8(xv):
        out = qi8.int8_gcn2_forward(net, xv)
        # int8 carry dependence: low bit of the output, matrix-shaped
        # (wrapping int8 add; values are irrelevant, the dependence is not)
        dep = (out[:, : 1].astype(jnp.int32) & 1).astype(jnp.int8)
        return xv.at[:, :1].add(dep)

    sec = timed_loop(fwd_i8, xs, iters=8000)
    print(f"  int8 dense 2-layer fwd {sec * 1e3:8.4f} ms")


def main_sparse(dataset: str = "pubmed", tb: int = 512):
    """Sparse-backend aggregation: int8 tile kernel (bsr_spmm_int8) vs the
    bf16 tile kernel on the same tile population — the on-chip
    int8-vs-bf16 aggregation throughput at a size the dense path cannot
    touch."""
    from sgracex1_tpu.graph.reorder import rcm_order, permute_graph
    from sgracex1_tpu.ops.bsr import (
        bsr_from_sparse, bsr_spmm_pallas, bsr_spmm_int8,
    )
    from sgracex1_tpu.quant.affine import generate_constants

    rng = np.random.default_rng(0)
    adj, _, _ = load(dataset)
    adj, _ = permute_graph(adj, rcm_order(adj))
    n = adj.n_rows
    vmax = float(np.asarray(adj.vals).max()) or 1.0
    c_a = generate_constants(0.0, vmax, 8, signed=False, w_qbits=8)

    B_f = jax.device_put(
        bsr_from_sparse(adj, tb=tb, dtype=jnp.bfloat16, cover_rows=True)
    )
    B_i = jax.device_put(qi8.bsr_int8_from_sparse(adj, c_a, tb=tb))
    print(
        f"{dataset} sparse agg: N={n} nnz={adj.nnz} "
        f"tiles={B_i.num_tiles}x{tb}"
    )

    Hf = jax.device_put(rng.standard_normal((n, 128)).astype(np.float32))
    hq = jax.device_put(
        rng.integers(-127, 128, (n, 128)).astype(np.int8)
    )

    def agg_f(h, B):
        return h + bsr_spmm_pallas(B, h)[: h.shape[0]] * 1e-12

    def agg_i(h, B):
        acc = bsr_spmm_int8(B, h)[: h.shape[0]]
        return h + (acc & 1).astype(jnp.int8)  # wrapping; real dependence

    sec_f = timed_loop(agg_f, Hf, consts=(B_f,), iters=200)
    print(
        f"  bf16 tile agg {sec_f*1e3:8.4f} ms  "
        f"({adj.nnz/sec_f/1e6:6.0f} M edges/s)"
    )
    sec_i = timed_loop(agg_i, hq, consts=(B_i,), iters=200)
    print(
        f"  int8 tile agg {sec_i*1e3:8.4f} ms  "
        f"({adj.nnz/sec_i/1e6:6.0f} M edges/s, {sec_f/sec_i:.2f}x vs bf16)"
    )
    # correctness spot check on-chip: exact integer product
    import scipy.sparse as sp

    acc = np.asarray(bsr_spmm_int8(B_i, hq))[:n]
    v = np.asarray(adj.vals[: adj.nnz])
    aq = np.clip(np.round(v / c_a.s + c_a.z), 0, c_a.beta_q)
    mat = sp.coo_matrix(
        (aq, (np.asarray(adj.rows[: adj.nnz]), np.asarray(adj.cols[: adj.nnz]))),
        shape=(n, n),
    ).tocsr()
    ref = mat @ np.asarray(hq).astype(np.int64)
    print(f"  int8 agg exactness: maxdiff {np.abs(acc - ref).max()}")


if __name__ == "__main__":
    header("int8 vs float inference")
    main(sys.argv[1] if len(sys.argv) > 1 else "cora")
    main_sparse("pubmed")
