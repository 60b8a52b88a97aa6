"""Engine-level configuration.

TPU-native analog of the reference's option surfaces:
- `snn::Precision` / `WeightAccessMethod` / `MRTMode` (reference
  core/inc/snn/snn.h:54-117) collapse into `Precision` below: on TPU there
  is one weight store (HBM arrays) and no MRT-style multi-pass channel
  chunking — channel splitting is done by sharding across chips instead.
- `snn::dp::ShaderGenOptions` (reference core/inc/snn/layeroption.h:27-47)
  becomes `EngineOptions`: the per-layer "fragment vs compute shader vs
  Vulkan" choice becomes "XLA-native op vs custom Pallas kernel".
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Sequence


class Precision(enum.Enum):
    """Compute/storage precision policy.

    The reference supports FP32/FP16 (core/inc/snn/snn.h:64-67); on TPU the
    half-precision story is bfloat16, and the low-bit story is int8
    weight-only quantization with per-channel scales (BASELINE.json
    north_star).
    """

    FP32 = "fp32"
    BF16 = "bf16"
    INT8 = "int8"  # int8 weights + per-channel scales, bf16/fp32 activations

    @property
    def activation_dtype(self):
        import jax.numpy as jnp

        return jnp.float32 if self is Precision.FP32 else jnp.bfloat16

    @property
    def is_quantized(self) -> bool:
        return self is Precision.INT8


class BackendKind(enum.Enum):
    """Which compute path implements a layer.

    Analog of the reference's per-layer FS/CS/Vulkan selection
    (core/src/ic2/genericlayer.cpp:92-114 createCS/createFS fallback).
    """

    XLA = "xla"  # plain jax.numpy / lax ops, XLA fuses
    PALLAS = "pallas"  # hand-written Pallas kernel
    AUTO = "auto"  # per-layer: Pallas where it wins (small-channel convs)


@dataclasses.dataclass(frozen=True)
class ShardingOptions:
    """How to lay the model out over a device mesh.

    The mesh axes follow the scaling-book convention: `data` for
    batch/frame parallelism, `model` for channel (tensor) parallelism and
    `spatial` for H-dimension partitioning with halo exchange.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    spatial_axis: str = "spatial"
    # Number of ways to shard each axis; 1 = off. Products must divide the
    # device count of the mesh the engine is given.
    data: int = 1
    model: int = 1
    spatial: int = 1

    @property
    def total_devices(self) -> int:
        return self.data * self.model * self.spatial

    @property
    def is_sharded(self) -> bool:
        return self.total_devices > 1


@dataclasses.dataclass(frozen=True)
class EngineOptions:
    """Creation-time options for `Engine` / `InferenceProcessor`.

    Mirrors `InferenceProcessor::InitializationParameters` (reference
    demo/common/inferenceProcessor.h:34-45) with TPU-native fields.
    """

    precision: Precision = Precision.FP32
    # AUTO picks the fused Pallas path per layer on TPU and plain XLA
    # elsewhere (the analog of the reference choosing fragment vs compute
    # shader per layer at context creation, backendBuilder.cpp:28-50).
    backend: BackendKind = BackendKind.AUTO
    # Per-layer backend override: node name -> BackendKind.
    backend_overrides: Optional[dict] = None
    batch_size: int = 1
    sharding: ShardingOptions = dataclasses.field(default_factory=ShardingOptions)
    # How sharded graphs are compiled: "shard_map" (explicit SPMD: ppermute
    # halo exchange, all_gather TP epilogues, Pallas kernels kept per-shard)
    # or "gspmd" (XLA auto-partitioning; drops Pallas and disables TP under
    # SP due to a jax-0.9 GSPMD conv miscompile — kept as a baseline).
    spmd_mode: str = "shard_map"
    # Fused conv-chain kernel format: "auto" (packed-column where
    # supported, im2col otherwise), "packed", or "im2col". The packed
    # format (kernels/chain_packed_pallas.py) is MXU-bound — the im2col
    # one (kernels/chain_pallas.py) is VPU-store-bound and kept for
    # mid-graph chains and as an A/B baseline.
    chain_format: str = "auto"
    # Int8 ACTIVATIONS inside the packed chain kernel (a8): "auto" engages
    # per-layer int8 x int8 dots under an INT8 engine wherever the layer's
    # input range is statically boundable (chain_packed_pallas.
    # build_chain_packed a8 docstring); "off" keeps the chain's dots in
    # the activation dtype (weight-only int8) — the A/B baseline.
    chain_a8: str = "auto"
    # Fold BatchNorm into preceding conv weights at load (the reference
    # fuses BN into the conv shader epilogue: conv2dGL.cpp:666-747).
    fold_batchnorm: bool = True
    # Dump every layer's output for the validation harness (reference
    # --dump_outputs, openGLRenderpass.cpp:764-899).
    dump_outputs: bool = False
    dump_dir: str = "layer_dumps"
    # Output dtype: "float32" (default — reference-parity convenience) or
    # "activation" to return outputs in the compute dtype, skipping the
    # f32 upcast + layout copy of the largest tensor (the reference hands
    # consumers fp16 textures; serving pipelines should do the same).
    output_dtype: Optional[str] = "float32"
    # Let XLA choose the output buffer layouts (jax Layout.AUTO) instead of
    # forcing row-major defaults: removes the final layout copy of the
    # full-size output (~107us/step on ESPCN 1080p b8). On-device consumers
    # (streaming/pipeline stages) are layout-agnostic; host fetches relayout
    # during the transfer anyway.
    auto_output_layout: bool = False
    # Let XLA choose the INPUT frame layouts too: the relayout XLA would
    # otherwise run on-device (e.g. MobileNetV2's C=3 stem wants the
    # frame batch-minor — a 57us full-frame copy per b8 step, 13% of the
    # int8 step) happens during the host->device transfer instead, which
    # reformats anyway. Only meaningful for host-fed serving; off by
    # default because device-resident producers would pay a relayout per
    # submit if their layout differs.
    auto_input_layout: bool = False
    # Donate input frame buffers to the compiled step (the analog of the
    # reference's zero-copy texture attach, imageTexture.h:31). Off by
    # default because donated buffers cannot be re-submitted (benchmarks
    # re-feed the same frame); the streaming pipeline turns it on.
    donate_input: bool = False
    # Benchmark bookkeeping (reference NUM_EXCLUDE_FIRST_LOOPS=5,
    # inferenceProcessor.cpp:90).
    warmup_loops: int = 5

    def backend_for(self, node_name: str) -> BackendKind:
        if self.backend_overrides and node_name in self.backend_overrides:
            return self.backend_overrides[node_name]
        return self.backend


@dataclasses.dataclass(frozen=True)
class ModelType:
    """Postprocessing family, reference `snn::ModelType` (snn.h:96-101)."""

    OTHER = "other"
    CLASSIFICATION = "classification"
    DETECTION = "detection"


def default_options(**kwargs) -> EngineOptions:
    return EngineOptions(**kwargs)
