"""Operator library.

TPU-native replacement for the reference's "dp" operator layer
(core/src/ic2/ — one C++ class + GLSL shader generator per op,
registered in layerFactory.cpp:109-129). Here each op registers a shape
function and a compute body; the XLA path is plain jax.numpy/lax (XLA
fuses the epilogues the reference fused by shader codegen), and hot ops
also have Pallas kernels (shadernn_tpu.kernels) selected per layer via
EngineOptions.backend — the analog of the reference's per-layer
fragment-shader / compute-shader / Vulkan choice.
"""

# Import op modules for registration side effects.
from shadernn_tpu.ops import registry  # noqa: F401
from shadernn_tpu.ops import conv, dense, elementwise, normalize, pool, shape_ops, yolo  # noqa: F401,E501

get_op = registry.get_op
all_ops = registry.all_ops
