"""Automatic quantization calibration from observed activation ranges.

The reference calibrates by hand: per-qbits constant tables in
``init_SGRACE`` (sgrace.py:1296-1845) tuned from ``max_fea`` telemetry read
back from the hardware (sgrace.py:506-520). Here the telemetry is the
'telemetry' collection sown by the conv layers (nn/layers.py); this module
closes the loop: run a float forward, harvest the ranges, emit a
``CalibrationTable`` ready for QAT or int8 freezing.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from sgracex1_tpu.quant.calibration import CalibrationTable


def harvest_telemetry(model, params, *args, **kwargs) -> dict:
    """One forward pass collecting per-layer amax telemetry.

    Returns {layer_name: {x_amax, w_absmax, wh_absmax}} in module order.
    """
    _, state = model.apply(
        params, *args, mutable=["telemetry"], **kwargs
    )
    out = {}
    for layer, vals in state["telemetry"].items():
        out[layer] = {
            k: float(np.asarray(v[0])) for k, v in vals.items()
        }
    return out


def calibrate(
    model,
    params,
    *args,
    qbits: int = 8,
    base: Optional[CalibrationTable] = None,
    **kwargs,
) -> CalibrationTable:
    """Build a CalibrationTable whose tensor ranges come from a real forward
    pass of the float model (layers in module order: first conv = layer 1,
    second conv = layer 2)."""
    tel = harvest_telemetry(model, params, *args, **kwargs)
    layers = list(tel.values())
    base = base or CalibrationTable.for_qbits(qbits)
    o = {}
    if len(layers) >= 1:
        o.update(
            f_min=0.0, f_max=max(layers[0]["x_amax"], 1e-8),
            w_min=-max(layers[0]["w_absmax"], 1e-8),
            w_max=max(layers[0]["w_absmax"], 1e-8),
        )
    if len(layers) >= 2:
        o.update(
            f_min2=0.0, f_max2=max(layers[1]["x_amax"], 1e-8),
            w_min2=-max(layers[1]["w_absmax"], 1e-8),
            w_max2=max(layers[1]["w_absmax"], 1e-8),
        )
    return CalibrationTable.for_qbits(qbits, {**base.raw, **o})
