"""Convolution family: Conv2D, SeparableConv2D (depthwise), Conv2DTranspose.

TPU-native re-design of the reference conv operators (core/src/ic2/conv2d.cpp,
separableconvolution.cpp, deconv2dGL.cpp). Where the reference generates a
GLSL shader per layer with weights baked in and a fused
bias+BN+activation epilogue (conv2dGL.cpp:666-833), here the epilogue is
expressed in jnp and XLA fuses it into the convolution; the MRT multi-pass
output-channel chunking (conv2dGL.cpp:841-860) has no single-chip analog
(the MXU wants channels large, not chunked) — its multi-device analog is
channel sharding in shadernn_tpu.parallel.

Weight layout: HWIO float32 (or int8 + per-output-channel scales for
Precision.INT8 — fused dequant happens in the kernel). The reference's
OIHW->HWO4I4 texture repack (conv2d.cpp:135-160) is replaced by whatever
layout XLA/Mosaic picks.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.graph.ir import Node, TensorSpec, Transform, transform_output_dims
from shadernn_tpu.ops.common import apply_activation, is_same_padding, padding_offsets
from shadernn_tpu.ops.registry import OpDef, RunCtx, register

_DN = ("NHWC", "HWIO", "NHWC")


def get_weight(node: Node, name: str = "weight", compute_dtype=jnp.float32):
    """Materialize a weight, dequantizing int8 weight-only storage.

    INT8 storage: params[f"{name}_q"] int8 + params[f"{name}_scale"]
    per-output-channel float32 (BASELINE.json north_star). The XLA path
    dequantizes here (cheap, weight-sized); the Pallas path fuses dequant
    into the kernel instead.
    """
    if f"{name}_q" in node.params:
        wq = node.params[f"{name}_q"]
        scale = node.params[f"{name}_scale"]
        return wq.astype(compute_dtype) * scale.astype(compute_dtype)
    return node.params[name].astype(compute_dtype)


def quantize_act(x, scale: float):
    """Symmetric int8 activation quantization for the A8W8 path (matches
    quant.calibrate.quantize_activation; clip to +/-127 keeps the range
    symmetric so -x quantizes to -q)."""
    return (
        jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127)
        .astype(jnp.int8)
    )


def a8w8_profitable(k: int, cin: int, cout: int) -> bool:
    """Should this conv run int8 activations on the XLA path?

    Int8 doubles MXU throughput (394 vs 197 TF) but costs a quantize pass
    plus the layout copies XLA inserts around an int8 convolution's
    operands/results. Traced on MobileNetV2 (DEVNOTES r4): engaging A8W8
    on its stem (k3, cin 3) ran the conv at 1.7 TF/s and added ~0.3 ms of
    data-formatting copies per step — a 1.64x step regression — while
    ResNet18's k3/cin>=64 convs gain 1.5x. The contraction dimension must
    be MXU-sized for the 2x compute rate to outweigh the fixed quant +
    relayout toll: require a reasonably full K (k*k*cin) and a lane-filling
    output width.
    """
    return cin >= 16 and cout >= 32 and k * k * cin >= 256


def bn_scale_offset(node: Node, out_dtype):
    """Per-channel (scale, offset) for an unfolded BatchNorm epilogue.

    y = gamma * (x - mean) / sqrt(var + eps) + beta. The reference folds
    this into the generated shader (conv2dGL.cpp:666-747); here it's two
    per-channel vectors XLA fuses into the conv epilogue.
    """
    eps = float(node.attr("bn_epsilon", 1e-3))
    g = jnp.asarray(node.params["bn_gamma"], jnp.float32)
    b = jnp.asarray(node.params["bn_beta"], jnp.float32)
    m = jnp.asarray(node.params["bn_mean"], jnp.float32)
    v = jnp.asarray(node.params["bn_variance"], jnp.float32)
    scale = g * jax.lax.rsqrt(v + eps)
    offset = b - m * scale
    return scale.astype(out_dtype), offset.astype(out_dtype)


def _epilogue(node: Node, y, ctx: RunCtx):
    """bias -> BN -> activation, matching the reference shader epilogue order
    (bias add then BN then activation, conv2dGL.cpp:815-833)."""
    if "bias" in node.params and node.attr("use_bias", True):
        y = y + jnp.asarray(node.params["bias"], y.dtype)
    if node.attr("use_batchnorm", False) and "bn_gamma" in node.params:
        scale, offset = bn_scale_offset(node, y.dtype)
        y = y * scale + offset
    return apply_activation(y, node.attr("activation", "linear"), float(node.attr("leaky_alpha", 0.3)))


def _conv_pads(node: Node):
    k = int(node.attr("kernel_size"))
    return padding_offsets(node.attr("padding", "same"), k)


def _interpret_mode() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU CI)."""
    return jax.default_backend() != "tpu"


def epilogue_scale_offset(node: Node):
    """Fold int8 dequant scale + bias + BatchNorm into one per-output-channel
    (scale, offset) pair: y = act(acc * scale + offset). Matches the order of
    the reference shader epilogue (bias, then BN — conv2dGL.cpp:815-833)."""
    if "weight_q" in node.params:
        o = node.params["weight_q"].shape[-1]
        scale = jnp.asarray(node.params["weight_scale"], jnp.float32).reshape(o)
    else:
        o = node.params["weight"].shape[-1]
        scale = jnp.ones((o,), jnp.float32)
    offset = jnp.zeros((o,), jnp.float32)
    if "bias" in node.params and node.attr("use_bias", True):
        offset = jnp.asarray(node.params["bias"], jnp.float32)
    if node.attr("use_batchnorm", False) and "bn_gamma" in node.params:
        bn_s, bn_o = bn_scale_offset(node, jnp.float32)
        scale = scale * bn_s
        offset = offset * bn_s + bn_o
    return scale, offset


def _conv_run_pallas(node: Node, x, ctx: RunCtx):
    """PALLAS path of Conv2D: NHCW implicit-GEMM kernel with the fused
    dequant+bias+BN+activation epilogue (shadernn_tpu/kernels/conv_pallas.py)."""
    from shadernn_tpu.kernels.conv_pallas import conv2d_pallas_nhwc

    st = int(node.attr("stride", 1))
    pads = _conv_pads(node)
    scale, offset = epilogue_scale_offset(node)
    if "weight_q" in node.params:
        w = jnp.asarray(node.params["weight_q"])  # int8 HWIO
    else:
        w = jnp.asarray(node.params["weight"], x.dtype)
    return conv2d_pallas_nhwc(
        x, w, scale, offset,
        stride=st, pads=pads,
        activation=node.attr("activation", "linear"),
        alpha=float(node.attr("leaky_alpha", 0.3)),
        interpret=_interpret_mode(),
    )


def pallas_conv_supported(node: Node, x_shape, dtype=None) -> bool:
    k = int(node.attr("kernel_size"))
    st = int(node.attr("stride", 1))
    c = x_shape[-1]
    o = int(node.attr("out_channels"))
    # stride 2 is gated off: the kernel's strided phase-split reshape is
    # an unsupported Mosaic shape cast on current TPU toolchains (any
    # dtype) — it fails at compile time on real hardware while passing in
    # interpret mode. Stride-2 convs run on XLA, or go through the
    # stride2 -> SpaceToDepth folding pass and re-enter here as stride 1.
    del dtype
    return st == 1 and c <= 128 and o <= 128 and k * k * c <= 4096


def pallas_chain_supported(node: Node, in_channels: int) -> bool:
    """Can this conv run in the haloed NHCW chain format (zero glue)?"""
    from shadernn_tpu.kernels.conv_pallas import MH, ML

    if int(node.attr("stride", 1)) != 1:
        return False
    k = int(node.attr("kernel_size"))
    t, b, l, r = _conv_pads(node)
    o = int(node.attr("out_channels"))
    return (
        t <= MH and l <= ML and b <= 9 and r <= 8
        and in_channels <= 128 and o <= 128 and k * k * in_channels <= 4096
    )


def conv_run_pallas_chain(node: Node, v, ctx: RunCtx):
    """Haloed-chain path: consumes NHWC or HaloedValue, returns HaloedValue."""
    from shadernn_tpu.kernels.conv_pallas import (
        HaloedValue, fused_conv2d_haloed, rowpack_weights, to_haloed,
        to_haloed_rowpacked,
    )

    scale, offset = epilogue_scale_offset(node)
    if "weight_q" in node.params:
        w = jnp.asarray(node.params["weight_q"])
    else:
        w = None  # cast after we know the activation dtype
    pads = _conv_pads(node)
    k = int(node.attr("kernel_size"))
    if not isinstance(v, HaloedValue):
        if w is None:
            w = jnp.asarray(node.params["weight"], v.dtype)
        if v.shape[-1] == 1 and 1 < k <= 16:
            # Single-channel chain head (e.g. ESPCN's 5x5 stem): fold the
            # vertical taps into C — 5x fewer MXU K-passes (see
            # to_haloed_rowpacked).
            pt, pb, pl_, pr = pads
            v = to_haloed_rowpacked(v, k, pt, pb)
            w = rowpack_weights(w)
            pads = (0, 0, pl_, pr)
        else:
            v = to_haloed(v)
    elif w is None:
        w = jnp.asarray(node.params["weight"], v.arr.dtype)
    return fused_conv2d_haloed(
        v, w, scale, offset,
        stride=1, pads=pads,
        activation=node.attr("activation", "linear"),
        alpha=float(node.attr("leaky_alpha", 0.3)),
        interpret=_interpret_mode(),
    )


@register("Conv2D", "Convolution")
class Conv2D(OpDef):
    """2D convolution with fused bias/BN/activation epilogue.

    Shape transform mirrors Conv2DLayer::getOutputScaleDimAdjustment
    (conv2d.cpp:162-174); equivalently out = floor((H+padT+padB-k)/s)+1.
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        k, st = int(node.attr("kernel_size")), int(node.attr("stride", 1))
        t_pad, b_pad, l_pad, r_pad = _conv_pads(node)
        if isinstance(node.attr("padding", "same"), (list, tuple)):
            # Explicit per-side pads (produced by the stride-2 folding
            # pass): exact arithmetic, no reference Transform quirks.
            tr_h = 1 + (t_pad + b_pad - k) / st
            tr_w = 1 + (l_pad + r_pad - k) / st
        elif k % 2 != 0:
            tr_h = tr_w = 1 + (t_pad + b_pad - k) / st
        else:
            tr_h = tr_w = 1 + (t_pad + b_pad - 1 - k) / st
        t = Transform(scale_w=1 / st, scale_h=1 / st, translate_w=tr_w, translate_h=tr_h)
        h, w = transform_output_dims(t, in_specs)
        return s.with_shape((s.n, h, w, int(node.attr("out_channels"))))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        # Multi-input conv (reference use_multi_inputs, modelparser.cpp):
        # extra inputs are channel-concatenated before the conv.
        if len(xs) > 1:
            x = jnp.concatenate(xs, axis=-1)
        from shadernn_tpu.config import BackendKind

        if ctx.backend == BackendKind.PALLAS and pallas_conv_supported(node, x.shape, x.dtype):
            return _conv_run_pallas(node, x, ctx)
        st = int(node.attr("stride", 1))
        t, b, l, r = _conv_pads(node)
        from shadernn_tpu.config import Precision

        sa = float(node.attr("in_act_scale", 0.0) or 0.0)
        k_ = int(node.attr("kernel_size"))
        cin_ = x.shape[-1]
        # A8W8 only under an INT8 engine: a graph calibrated+quantized for
        # INT8 must still run full-precision when rebuilt at FP32/BF16
        # (weights dequantize via get_weight; activations stay float).
        # And only where the int8 MXU rate beats the quant/relayout toll
        # (a8w8_profitable — unprofitable convs run dequantized weights).
        if ("weight_q" in node.params and sa > 0.0
                and ctx.precision == Precision.INT8
                and a8w8_profitable(k_, cin_, int(node.attr("out_channels")))):
            # A8W8: calibrated activation scale (quant/calibrate.py) ->
            # quantize the input, run int8 x int8 -> int32 on the MXU's
            # 394-TFLOPs int8 path, fold (act_scale * weight_scale) into
            # the dequant. Symmetric, zero-point 0, so SAME padding's
            # zeros are exact.
            xq = quantize_act(x, sa)
            acc = jax.lax.conv_general_dilated(
                xq,
                jnp.asarray(node.params["weight_q"]),
                window_strides=(st, st),
                padding=((t, b), (l, r)),
                dimension_numbers=_DN,
                preferred_element_type=jnp.int32,
            )
            ws = jnp.asarray(node.params["weight_scale"], jnp.float32)
            y = (acc.astype(jnp.float32) * (sa * ws.reshape(-1))).astype(x.dtype)
            return _epilogue(node, y, ctx)
        w = get_weight(node, compute_dtype=x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w, x.dtype),
            window_strides=(st, st),
            padding=((t, b), (l, r)),
            dimension_numbers=_DN,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return _epilogue(node, y, ctx)

    def flops(self, node: Node, in_specs: Sequence[TensorSpec]) -> int:
        o = self.infer(node, in_specs)
        k = int(node.attr("kernel_size"))
        cin = in_specs[0].c * (len(in_specs) if len(in_specs) > 1 else 1)
        return 2 * o.n * o.h * o.w * k * k * cin * o.c


@register("SeparableConv2D", "DepthwiseConv2D")
class SeparableConv2D(OpDef):
    """Depthwise convolution (with channel multiplier).

    Reference: separableconvolution.cpp (depthwise weights HWC(M), JSON
    field depthwise_weights). Implemented via feature_group_count=C.
    Weight layout: HWIO with I=1, O=C*multiplier.
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        k, st = int(node.attr("kernel_size")), int(node.attr("stride", 1))
        t_pad, b_pad, _, _ = _conv_pads(node)
        if k % 2 != 0:
            tr = 1 + (t_pad + b_pad - k) / st
        else:
            tr = 1 + (t_pad + b_pad - 1 - k) / st
        t = Transform(scale_w=1 / st, scale_h=1 / st, translate_w=tr, translate_h=tr)
        h, w = transform_output_dims(t, in_specs)
        mult = int(node.attr("multiplier", 1))
        return s.with_shape((s.n, h, w, s.c * mult))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        st = int(node.attr("stride", 1))
        t, b, l, r = _conv_pads(node)
        w = get_weight(node, compute_dtype=x.dtype)  # (kh, kw, 1, C*mult)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w, x.dtype),
            window_strides=(st, st),
            padding=((t, b), (l, r)),
            dimension_numbers=_DN,
            feature_group_count=x.shape[-1],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return _epilogue(node, y, ctx)

    def flops(self, node: Node, in_specs: Sequence[TensorSpec]) -> int:
        o = self.infer(node, in_specs)
        k = int(node.attr("kernel_size"))
        return 2 * o.n * o.h * o.w * k * k * o.c


@register("Conv2DTranspose", "Deconvolution")
class Conv2DTranspose(OpDef):
    """Transposed convolution.

    Shape transform mirrors Conv2DTransposeLayerGl::getOutputScaleDimAdjustment
    (deconv2dGL.cpp:346-355): out = s*H ("same") or s*H + (k - s) otherwise.
    Weight layout: HWIO (I = input channels, O = output channels).
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        k, st = int(node.attr("kernel_size")), int(node.attr("stride", 1))
        same = is_same_padding(node.attr("padding", "same"))
        tr = 0.0 if same else float(k - st)
        t = Transform(scale_w=float(st), scale_h=float(st), translate_w=tr, translate_h=tr)
        h, w = transform_output_dims(t, in_specs)
        return s.with_shape((s.n, h, w, int(node.attr("out_channels"))))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        st = int(node.attr("stride", 1))
        same = is_same_padding(node.attr("padding", "same"))
        w = get_weight(node, compute_dtype=x.dtype)
        # Keras/torch deconv semantics = gradient-of-conv, i.e. the kernel is
        # spatially flipped relative to lax.conv_transpose's forward-kernel
        # convention (transpose_kernel=False); flip here so HWIO weights
        # converted from Keras/ONNX produce identical results.
        w = jnp.flip(jnp.asarray(w, x.dtype), axis=(0, 1))
        y = jax.lax.conv_transpose(
            x,
            w,
            strides=(st, st),
            padding="SAME" if same else "VALID",
            dimension_numbers=_DN,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return _epilogue(node, y, ctx)

    def flops(self, node: Node, in_specs: Sequence[TensorSpec]) -> int:
        s = in_specs[0]
        k = int(node.attr("kernel_size"))
        return 2 * s.n * s.h * s.w * k * k * s.c * int(node.attr("out_channels"))
