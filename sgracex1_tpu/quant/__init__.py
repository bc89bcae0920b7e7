from sgracex1_tpu.quant.affine import (
    QuantConstants,
    generate_constants,
    quantize,
    fake_quant_signed,
    fake_quant_unsigned,
    internal_fixed_point,
    ste,
)
from sgracex1_tpu.quant.calibration import CalibrationTable, LayerQuantParams

__all__ = [
    "QuantConstants",
    "generate_constants",
    "quantize",
    "fake_quant_signed",
    "fake_quant_unsigned",
    "internal_fixed_point",
    "ste",
    "CalibrationTable",
    "LayerQuantParams",
]
