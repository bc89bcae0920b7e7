"""Adaptive affine quantization (1/2/4/8-bit) — the reference's quant math.

Re-implements, bit-for-bit, the quantization functions of
``demo/sgrace_lib/sgrace.py:53-265``:

- ``quantize``: affine ``round(x/s + z)`` clamp to [alpha_q, beta_q]
  (``quantization``, sgrace.py:53-59); the 1-bit signed case is binary +-1
  (``quantization_b``, sgrace.py:62-67).
- fake-quant variants used for QAT emulation: same rounding/clamping, then a
  rescale by ``2^{-(qbits-1)}`` that models the hardware's fixed-point
  insertion (``fake_quantization``, sgrace.py:191-235); 1-bit fake variants
  produce +-0.5 / {0, 0.5} (sgrace.py:177-189).
- ``generate_constants``: scale/zero-point generation including the
  hardware's "output scale" ``s_o`` accounting for the 7.25 fixed-point
  alignment (``generate_quantization_constants``, sgrace.py:95-132).
- ``internal_fixed_point``: emulation of the accelerator's internal QTYPE
  pipeline after X@W — shift by ``scale_fea``, clamp to
  ±(2^iq - 1)/2^iq, round to iq-1 decimal digits (sgrace.py:603-616).

All fake-quant ops are exposed with straight-through-estimator gradients
(``ste``): the reference achieves STE by construction because the whole layer
lives inside a custom autograd Function whose backward ignores quantization
(``FPYNQ_GAT.backward``, sgrace.py:883-1126).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantConstants:
    """(s_o, s, z) triple for one tensor class.

    ``s`` / ``z`` are the affine scale/zero-point; ``s_o`` is the output
    ("dequantization") scale that folds in the fixed-point alignment of the
    hardware pipeline.
    """

    s_o: float
    s: float
    z: int
    qbits: int
    signed: bool

    @property
    def alpha_q(self) -> int:
        if self.signed:
            return -1 if self.qbits == 1 else -(2 ** (self.qbits - 1)) + 1
        return 0

    @property
    def beta_q(self) -> int:
        if self.signed:
            return 1 if self.qbits == 1 else 2 ** (self.qbits - 1) - 1
        return 2**self.qbits - 1


def generate_constants(
    alpha: float, beta: float, qbits: int, *, signed: bool, w_qbits: int
) -> QuantConstants:
    """Mirror of generate_quantization_{q,uq}bits_constants (sgrace.py:95-174).

    ``w_qbits`` is the *global* weight bit-width: the reference derives the
    output scale ``s_o`` from config.w_qbits regardless of this tensor's own
    qbits (sgrace.py:110-115).
    """
    if signed:
        if qbits == 1:
            alpha_q, beta_q = -1, 1
        else:
            alpha_q, beta_q = -(2 ** (qbits - 1)) + 1, 2 ** (qbits - 1) - 1
    else:
        alpha_q, beta_q = 0, 2**qbits - 1

    div = 2**2 if w_qbits == 1 else 2**w_qbits
    beta_o = beta_q / div
    alpha_o = alpha_q / div

    s_o = (beta - alpha) / (beta_o - alpha_o)
    s = (beta - alpha) / (beta_q - alpha_q)
    z = int((beta * alpha_q - alpha * beta_q) / (beta - alpha))
    return QuantConstants(s_o=s_o, s=s, z=z, qbits=qbits, signed=signed)


# --------------------------------------------------------------------------
# integer quantization (the "real" path — used for int8 inference and the
# hardware-offloaded backward emulation)
# --------------------------------------------------------------------------


def quantize(x: jax.Array, c: QuantConstants) -> jax.Array:
    """Affine quantize to the integer grid (float-valued, like the reference
    keeps them in float buffers). sgrace.py:53-92."""
    if c.signed and c.qbits == 1:
        xq = x / c.s + c.z
        return jnp.where(xq < 0, -1.0, 1.0)
    xq = jnp.round(x / c.s + c.z)
    return jnp.clip(xq, c.alpha_q, c.beta_q)


def dequantize(x_q: jax.Array, c: QuantConstants) -> jax.Array:
    return (x_q - c.z) * c.s


# --------------------------------------------------------------------------
# fake quantization (QAT emulation) — forward-only effects, STE gradients
# --------------------------------------------------------------------------


def ste(x: jax.Array, quantized: jax.Array) -> jax.Array:
    """Straight-through estimator: forward = quantized, gradient = identity."""
    return x + jax.lax.stop_gradient(quantized - x)


def _fake_quant_core(
    x: jax.Array, c: QuantConstants, w_qbits: int
) -> jax.Array:
    """fake_quantization (sgrace.py:191-235): round/clip then rescale by
    2^-(w_qbits-1) to model the fixed-point insertion."""
    xq = jnp.round(x / c.s + c.z)
    xq = jnp.clip(xq, c.alpha_q, c.beta_q)
    return xq / (2.0 ** (w_qbits - 1))


def fake_quant_signed(
    x: jax.Array, c: QuantConstants, w_qbits: int, *, straight_through: bool = True
) -> jax.Array:
    """quantization_fbits (sgrace.py:238-251): signed fake quant; 1-bit is
    binary +-0.5 (fake_quantization_b, sgrace.py:177-182)."""
    if c.qbits == 1:
        xq = x / c.s + c.z
        q = jnp.where(xq < 0, -0.5, 0.5)
    else:
        q = _fake_quant_core(x, c, w_qbits)
    return ste(x, q) if straight_through else q


def fake_quant_unsigned(
    x: jax.Array, c: QuantConstants, w_qbits: int, *, straight_through: bool = True
) -> jax.Array:
    """quantization_ufbits (sgrace.py:253-265): unsigned fake quant; 1-bit
    uses fake_quantization_b2 — round/clip to {0,1} then halve
    (sgrace.py:184-189)."""
    if c.qbits == 1:
        xq = jnp.round(x / c.s + c.z)
        q = jnp.clip(xq, 0.0, 1.0) / 2.0
    else:
        q = _fake_quant_core(x, c, w_qbits)
    return ste(x, q) if straight_through else q


def internal_fixed_point(
    wh: jax.Array,
    scale_fea: int,
    internal_quantization: int,
    *,
    straight_through: bool = True,
) -> jax.Array:
    """Emulate the accelerator's internal fixed-point pipeline after X@W
    (sgrace.py:603-616): shift right by scale_fea, clamp to
    ±(2^iq - 1)/2^iq, round to iq-1 decimal digits."""
    iq = internal_quantization
    q = wh / (2.0**scale_fea)
    lim = (2.0**iq - 1.0) / (2.0**iq)
    q = jnp.clip(q, -lim, lim)
    # torch.round(x, decimals=d) == round(x * 10^d) / 10^d
    p = 10.0 ** (iq - 1)
    q = jnp.round(q * p) / p
    return ste(wh, q) if straight_through else q
