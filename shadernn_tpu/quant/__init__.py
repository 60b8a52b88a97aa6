from shadernn_tpu.quant.quantize import (  # noqa: F401
    dequantize,
    quantize_graph_weights,
    quantize_weight,
)
