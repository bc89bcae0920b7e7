"""Quantization math parity with the reference (sgrace.py:53-265,1296-1845)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgracex1_tpu.quant.affine import (
    generate_constants,
    quantize,
    fake_quant_signed,
    fake_quant_unsigned,
    internal_fixed_point,
)
from sgracex1_tpu.quant.calibration import CalibrationTable


def ref_generate_constants(alpha, beta, alpha_q, beta_q, w_qbits):
    """Literal transcription of generate_quantization_constants
    (sgrace.py:95-132) in numpy, used as the oracle."""
    if w_qbits == 1:
        beta_o = beta_q / (2**2)
        alpha_o = alpha_q / (2**2)
    else:
        beta_o = beta_q / (2**w_qbits)
        alpha_o = alpha_q / (2**w_qbits)
    s_o = (beta - alpha) / (beta_o - alpha_o)
    s = (beta - alpha) / (beta_q - alpha_q)
    z = int((beta * alpha_q - alpha * beta_q) / (beta - alpha))
    return s_o, s, z


@pytest.mark.parametrize("qbits", [1, 2, 4, 8])
@pytest.mark.parametrize("signed", [True, False])
def test_constants_match_reference(qbits, signed):
    alpha, beta = (-1.0, 1.0) if signed else (0.0, 1.0)
    c = generate_constants(alpha, beta, qbits, signed=signed, w_qbits=qbits)
    if signed:
        aq = -1 if qbits == 1 else -(2 ** (qbits - 1)) + 1
        bq = 1 if qbits == 1 else 2 ** (qbits - 1) - 1
    else:
        aq, bq = 0, 2**qbits - 1
    s_o, s, z = ref_generate_constants(alpha, beta, aq, bq, qbits)
    assert c.s_o == pytest.approx(s_o)
    assert c.s == pytest.approx(s)
    assert c.z == z
    assert (c.alpha_q, c.beta_q) == (aq, bq)


def test_quantize_8bit_signed(rng):
    c = generate_constants(-1.0, 1.0, 8, signed=True, w_qbits=8)
    x = rng.uniform(-2, 2, 64).astype(np.float32)
    got = np.asarray(quantize(jnp.asarray(x), c))
    expect = np.clip(np.round(x / c.s + c.z), -127, 127)
    np.testing.assert_allclose(got, expect)


def test_quantize_1bit_is_sign(rng):
    c = generate_constants(-0.1, 0.1, 1, signed=True, w_qbits=1)
    x = rng.uniform(-1, 1, 64).astype(np.float32)
    got = np.asarray(quantize(jnp.asarray(x), c))
    assert set(np.unique(got)) <= {-1.0, 1.0}
    np.testing.assert_allclose(got, np.where(x / c.s + c.z < 0, -1.0, 1.0))


@pytest.mark.parametrize("qbits", [2, 4, 8])
def test_fake_quant_signed_matches_reference(rng, qbits):
    """quantization_fbits: round/clip then /2^(w_qbits-1) (sgrace.py:191-251)."""
    c = generate_constants(-1.0, 1.0, qbits, signed=True, w_qbits=qbits)
    x = rng.uniform(-2, 2, 128).astype(np.float32)
    got = np.asarray(fake_quant_signed(jnp.asarray(x), c, qbits))
    aq, bq = -(2 ** (qbits - 1)) + 1, 2 ** (qbits - 1) - 1
    # numpy round is round-half-even, same as torch.round
    expect = np.clip(np.round(x / c.s + c.z), aq, bq) / (2 ** (qbits - 1))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_fake_quant_1bit_variants(rng):
    x = rng.uniform(-1, 1, 64).astype(np.float32)
    cs = generate_constants(-0.1, 0.1, 1, signed=True, w_qbits=1)
    got = np.asarray(fake_quant_signed(jnp.asarray(x), cs, 1))
    assert set(np.unique(got)) <= {-0.5, 0.5}  # fake_quantization_b
    cu = generate_constants(0.0, 1.0, 1, signed=False, w_qbits=1)
    got = np.asarray(fake_quant_unsigned(jnp.asarray(x), cu, 1))
    assert set(np.unique(got)) <= {0.0, 0.5}  # fake_quantization_b2


def test_internal_fixed_point(rng):
    x = rng.uniform(-40, 40, 128).astype(np.float32)
    got = np.asarray(internal_fixed_point(jnp.asarray(x), 4, 16))
    lim = (2**16 - 1) / 2**16
    expect = np.round(np.clip(x / 16.0, -lim, lim) * 10**15) / 10**15
    np.testing.assert_allclose(got, expect.astype(np.float32), atol=1e-6)


def test_ste_gradients_are_identity(rng):
    c = generate_constants(0.0, 1.0, 8, signed=False, w_qbits=8)
    x = jnp.asarray(rng.uniform(0, 1, 32).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(fake_quant_unsigned(v, c, 8)))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(32), atol=1e-6)


def test_calibration_table_deq_o():
    """deq_o = w_s_o * f_s_o * a_s_o * 2^1 for the 8-bit cora table
    (sgrace.py:1681,1702)."""
    t = CalibrationTable.for_qbits(8)
    w_s_o, _, _ = ref_generate_constants(-1.0, 1.0, -127, 127, 8)
    f_s_o, _, _ = ref_generate_constants(0.0, 1.0, 0, 255, 8)
    a_s_o = f_s_o
    assert t.deq_o == pytest.approx(w_s_o * f_s_o * a_s_o * 2.0)
    p1 = t.layer_params(0)
    assert p1.scale_fea == 4 and p1.internal_quantization == 16
    p2 = t.layer_params(1)
    assert p2.deq_o == pytest.approx(t.deq_o2)


@pytest.mark.parametrize("qbits", [1, 2, 4, 8])
def test_calibration_table_all_qbits(qbits):
    t = CalibrationTable.for_qbits(qbits)
    assert t.raw["beta_qu"] == {8: 255, 4: 15, 2: 2, 1: 1}[qbits]
    assert t.raw["internal_quantization"] == {8: 16, 4: 8, 2: 4, 1: 4}[qbits]
    assert t.grad_out.qbits == 8


def test_calibrate_from_amax():
    t = CalibrationTable.for_qbits(8)
    t2 = t.calibrate_from_amax(f_max=3.0)
    assert t2.features.s == pytest.approx(3.0 / 255)
    assert t2.weights.s == t.weights.s
