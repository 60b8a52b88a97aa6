"""ShaderNN-TPU: a TPU-native quantized CNN inference engine.

A ground-up re-design of the capabilities of ShaderNN (OPPO's mobile-GPU
inference framework, see /root/reference) for TPU hardware:

- ShaderNN's GLSL fragment/compute-shader operators (reference
  core/src/ic2/conv2dGL.cpp) become XLA-compiled JAX ops plus fused Pallas
  kernels (conv + int8 weight dequant + bias + BN + activation epilogue).
- Its pre-built static computation graph (reference core/src/ic2/dp.cpp)
  becomes a small graph IR traced and jit-compiled into a single XLA
  executable per model.
- Its zero-copy texture I/O (reference core/inc/snn/imageTexture.h) becomes
  donated HBM buffers and an on-device ingest kernel (uint8 frame ->
  normalized NHWC), keeping frames on-device end to end.
- Single-device inference generalizes to SPMD over a `jax.sharding.Mesh`:
  tensor (channel) parallelism, spatial partitioning with halo exchange via
  ICI collectives, data parallelism, and continuous batching across hosts.

Public API mirrors the reference's `InferenceProcessor` (reference
demo/common/inferenceProcessor.h:32) at `shadernn_tpu.engine`.
"""

__version__ = "0.1.0"

from shadernn_tpu.config import (  # noqa: F401
    BackendKind,
    EngineOptions,
    Precision,
)
from shadernn_tpu.graph.ir import Graph, Node, TensorSpec  # noqa: F401
from shadernn_tpu.engine.engine import Engine  # noqa: F401
from shadernn_tpu.engine.processor import InferenceProcessor  # noqa: F401
