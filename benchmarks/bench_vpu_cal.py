"""Calibrate the roofline's VPU peaks on the attached chip.

The reference localizes bottlenecks with in-fabric FIFO stall counters
(kernelMatrixmult_all.cpp:1018-1291); our roofline (utils/roofline.py)
instead models per-kernel ideal resource time, which requires knowing the
chip's peak rates. HBM and MXU peaks are published; the VPU's sustained
elementwise and transcendental rates are not, so this script measures them:

- simple f32 elementwise ops (mul / add / max chains) on a VMEM-resident
  block inside one fori_loop;
- ``exp`` throughput the same way (the op class that dominates softmax
  kernels).

The measured numbers are baked into roofline.V5E_PEAK_VPU_OPS /
V5E_PEAK_TRANSC (with the measurement date); re-run this after any
hardware change.

Usage: python benchmarks/bench_vpu_cal.py
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timed_loop, header

# one VMEM-resident f32 block: 512 x 1024 x 4 B = 2 MB (fits ~16 MB VMEM
# alongside the loop machinery, so the measurement is compute- not
# HBM-bound once XLA keeps the carry on-chip across iterations)
SHAPE = (512, 1024)


def measure(name: str, step, ops_per_elt: float, transc_per_elt: float = 0.0):
    x = jnp.full(SHAPE, 0.5, jnp.float32)
    sec = timed_loop(step, x, iters=3000, k1=500)
    n = SHAPE[0] * SHAPE[1]
    print(
        f"  {name:28s}: {sec * 1e6:8.2f} us/iter  "
        f"{ops_per_elt * n / sec / 1e12:6.2f} T simple-op/s"
        + (
            f"  {transc_per_elt * n / sec / 1e9:8.1f} G exp/s"
            if transc_per_elt
            else ""
        )
    )
    return sec


def _chain(k):
    """A k-op dependent mul/add chain (k even), bounded values."""

    def step(x):
        for _ in range(k // 2):
            x = x * 1.0000001
            x = x + 1e-7
        return x

    return step


def main():
    header("VPU calibration (elementwise + transcendental peaks)")

    # 8 dependent mul/add/max ops per element per iteration; the chain has a
    # data dependence so XLA cannot elide it, and constants keep x bounded
    def step_simple(x):
        x = x * 1.0000001
        x = x + 1e-7
        x = jnp.maximum(x, 0.25)
        x = x * 0.9999999
        x = x - 1e-7
        x = jnp.minimum(x, 4.0)
        x = x * 1.0000001
        x = x + 1e-7
        return x

    sec8 = measure("8-op mul/add/max chain", step_simple, 8.0)

    # select (where) throughput: 4 compare+select pairs
    def step_select(x):
        x = jnp.where(x > 0.3, x, x * 0.5)
        x = jnp.where(x < 4.0, x, x * 0.25)
        x = jnp.where(x > 0.3, x, x + 0.5)
        x = jnp.where(x < 4.0, x, x - 0.5)
        return x

    measure("4x compare+select", step_select, 8.0)

    # exp: x stays ~1.0 (exp(tiny * x) ~ 1), 1 mul + 1 exp per element
    def step_exp(x):
        return jnp.exp(x * 1e-8)

    sec_exp = measure("exp(mul)", step_exp, 1.0, transc_per_elt=1.0)

    # exp2 for comparison (exp2(x) = exp(x ln 2): is the base-2 form cheaper?)
    def step_exp2(x):
        return jnp.exp2(x * 1e-8)

    sec_exp2 = measure("exp2(mul)", step_exp2, 1.0, transc_per_elt=1.0)

    # tanh — another common transcendental, for the record
    def step_tanh(x):
        return jnp.tanh(x) + 0.5

    measure("tanh(+add)", step_tanh, 1.0, transc_per_elt=1.0)

    n = SHAPE[0] * SHAPE[1]

    # two-point chains: the SLOPE removes per-iteration loop overhead
    # (carry bookkeeping, dispatch), which inflates single-chain estimates
    sec4 = measure("4-op chain", _chain(4), 4.0)
    sec16 = measure("16-op chain", _chain(16), 16.0)
    sec32 = measure("32-op chain", _chain(32), 32.0)
    per_op = (sec32 - sec4) / 28.0
    overhead = sec4 - 4 * per_op
    peak_vpu = n / per_op
    # exp cost net of the loop overhead and its companion mul
    peak_exp = n / max(sec_exp - overhead - per_op, 1e-12)
    peak_exp2 = n / max(sec_exp2 - overhead - per_op, 1e-12)
    print(
        f"\n  => loop overhead ~{overhead*1e6:.2f} us/iter; "
        f"V5E_PEAK_VPU_OPS ~ {peak_vpu:.2e} op/s, "
        f"V5E_PEAK_TRANSC ~ {peak_exp:.2e} exp/s "
        f"(exp2 {peak_exp2:.2e}/s)"
    )
    print("  bake these into sgracex1_tpu/utils/roofline.py if they moved")


if __name__ == "__main__":
    main()
