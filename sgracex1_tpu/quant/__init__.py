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
from sgracex1_tpu.quant.int8 import (
    Int8GCN2,
    Int8GCNLayer,
    collect_amax_gcn2,
    freeze_gcn2,
    freeze_gcn_layer,
    int8_gcn2_forward,
    int8_gcn_layer,
    quantize_signed,
    quantize_unsigned_shifted,
)

__all__ = [
    "Int8GCN2",
    "Int8GCNLayer",
    "collect_amax_gcn2",
    "freeze_gcn2",
    "freeze_gcn_layer",
    "int8_gcn2_forward",
    "int8_gcn_layer",
    "quantize_signed",
    "quantize_unsigned_shifted",
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
