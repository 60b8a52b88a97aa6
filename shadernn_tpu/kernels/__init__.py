"""Pallas TPU kernels — the hand-tuned compute path.

The analog of the reference's generated GLSL shaders (conv2dGL.cpp etc.),
selected per layer via EngineOptions.backend = BackendKind.PALLAS, just as
the reference chose fragment vs compute shader vs Vulkan per layer.
"""

from shadernn_tpu.kernels.conv_pallas import fused_conv2d_nhcw  # noqa: F401
from shadernn_tpu.kernels.matmul_pallas import fused_matmul  # noqa: F401
