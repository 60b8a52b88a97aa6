"""Dense (fully-connected) layer.

Reference: core/src/ic2/denselayer.cpp (Eigen matvec + activation on CPU,
or compute-shader shadertemplate_cs_dense.glsl). Here it's a jnp matmul the
MXU executes; weight layout (in_features, units) matches the reference's
JSON `weights.kernel` row-major [input x units] stream
(modelparser.cpp getDenseLayer).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from shadernn_tpu.graph.ir import Node, TensorSpec
from shadernn_tpu.ops.common import apply_activation
from shadernn_tpu.ops.conv import get_weight
from shadernn_tpu.ops.registry import OpDef, RunCtx, register


@register("Dense", "FullyConnected", "InnerProduct")
class Dense(OpDef):
    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        units = int(node.attr("units"))
        return s.with_shape((s.n, units))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        from shadernn_tpu.config import BackendKind

        x = xs[0]
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        if ctx.backend == BackendKind.PALLAS:
            from shadernn_tpu.kernels.matmul_pallas import fused_matmul
            from shadernn_tpu.ops.conv import _interpret_mode, epilogue_scale_offset

            scale, offset = epilogue_scale_offset(node)
            w = (
                jnp.asarray(node.params["weight_q"])
                if "weight_q" in node.params
                else jnp.asarray(node.params["weight"], x.dtype)
            )
            return fused_matmul(
                x, w, scale, offset,
                activation=node.attr("activation", "linear"),
                alpha=float(node.attr("leaky_alpha", 0.3)),
                interpret=_interpret_mode(),
            )
        from shadernn_tpu.config import Precision

        sa = float(node.attr("in_act_scale", 0.0) or 0.0)
        # Same INT8-engine + profitability gates as ops/conv.py: calibrated
        # scales must not force int8 compute under an FP32/BF16 rebuild,
        # and the contraction must be MXU-sized to beat the quant toll.
        from shadernn_tpu.ops.conv import a8w8_profitable

        if ("weight_q" in node.params and sa > 0.0
                and ctx.precision == Precision.INT8
                and a8w8_profitable(1, x.shape[-1], int(node.attr("units")))):
            # A8W8 (see ops/conv.py): int8 x int8 -> int32 matmul with the
            # combined act/weight scale folded into the dequant.
            from shadernn_tpu.ops.conv import quantize_act

            xq = quantize_act(x, sa)
            acc = jnp.dot(
                xq,
                jnp.asarray(node.params["weight_q"]),
                preferred_element_type=jnp.int32,
            )
            ws = jnp.asarray(node.params["weight_scale"], jnp.float32)
            y = (acc.astype(jnp.float32) * (sa * ws.reshape(-1))).astype(x.dtype)
        else:
            w = get_weight(node, compute_dtype=x.dtype)  # (in, units)
            y = jnp.dot(x, jnp.asarray(w, x.dtype), preferred_element_type=jnp.float32)
            y = y.astype(x.dtype)
        if "bias" in node.params and node.attr("use_bias", True):
            y = y + jnp.asarray(node.params["bias"], y.dtype)
        return apply_activation(
            y, node.attr("activation", "linear"), float(node.attr("leaky_alpha", 0.3))
        )

    def flops(self, node: Node, in_specs: Sequence[TensorSpec]) -> int:
        s = in_specs[0]
        feat = 1
        for d in s.shape[1:]:
            feat *= d
        return 2 * s.n * feat * int(node.attr("units"))
