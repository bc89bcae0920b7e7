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
            return xv + jnp.sum(out).astype(dtype) * 1e-20

        sec = timed_loop(fwd, Xd, iters=50)
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
        # data dependence without leaving int8: flip sign bits via xor-like add
        return xv + (jnp.sum(out) * 0).astype(jnp.int8)

    sec = timed_loop(fwd_i8, xs, iters=50)
    print(f"  int8 dense 2-layer fwd {sec * 1e3:8.4f} ms")


if __name__ == "__main__":
    header("int8 vs float inference")
    main(sys.argv[1] if len(sys.argv) > 1 else "cora")
