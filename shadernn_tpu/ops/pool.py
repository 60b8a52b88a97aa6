"""Pooling ops: MaxPooling2D, AveragePooling2D, AdaptiveAvgPool2d.

Reference: core/src/ic2/maxpool2d.cpp, avgpool2d.cpp, adaptiveavgpool2dGL.cpp.
Shape transform (maxpool2d.cpp:26-35): scale = 1/stride; translate =
1 - k/stride ("valid") or 1 - 1/stride ("same"). Padding offsets share the
conv rules (maxpool2d.cpp:37-70).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.graph.ir import Node, TensorSpec, Transform, transform_output_dims
from shadernn_tpu.ops.common import padding_offsets
from shadernn_tpu.ops.registry import OpDef, RunCtx, register


def _pool_transform(node: Node) -> Transform:
    k, st = int(node.attr("kernel_size")), int(node.attr("stride", 1))
    pad = str(node.attr("padding", "same"))
    if pad in ("0", "valid", "none"):
        tr = 1.0 - k / st
    else:
        tr = 1.0 - 1.0 / st
    return Transform(scale_w=1 / st, scale_h=1 / st, translate_w=tr, translate_h=tr)


def _pool_pads(node: Node):
    k = int(node.attr("kernel_size"))
    return padding_offsets(node.attr("padding", "same"), k)


@register("MaxPooling2D", "MaxPool2D", "MaxPool")
class MaxPooling2D(OpDef):
    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        h, w = transform_output_dims(_pool_transform(node), in_specs)
        return s.with_shape((s.n, h, w, s.c))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        k, st = int(node.attr("kernel_size")), int(node.attr("stride", 1))
        t, b, l, r = _pool_pads(node)
        return jax.lax.reduce_window(
            x,
            -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            jax.lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, st, st, 1),
            padding=((0, 0), (t, b), (l, r), (0, 0)),
        )


@register("AveragePooling2D", "AvgPool2D", "AveragePool")
class AveragePooling2D(OpDef):
    """Average pooling; padded positions are excluded from the mean
    (count_include_pad=False, matching Keras/TF "same" semantics the
    reference's converter emits)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        h, w = transform_output_dims(_pool_transform(node), in_specs)
        return s.with_shape((s.n, h, w, s.c))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        k, st = int(node.attr("kernel_size")), int(node.attr("stride", 1))
        t, b, l, r = _pool_pads(node)
        pads = ((0, 0), (t, b), (l, r), (0, 0))
        sums = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, k, k, 1), (1, st, st, 1), pads
        )
        ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, k, k, 1), (1, st, st, 1), pads
        )
        return sums / counts


@register("AdaptiveAvgPool2d", "AdaptiveAvgPool")
class AdaptiveAvgPool2d(OpDef):
    """PyTorch-style adaptive average pooling to a fixed (oh, ow).

    Reference: adaptiveavgpool2dGL.cpp (GL-only there). Implemented with a
    2D integral image (cumsum) + static boundary gathers, which stays
    XLA-friendly for non-divisible sizes.
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        oh = int(node.attr("output_height", node.attr("output_size", 1)))
        ow = int(node.attr("output_width", node.attr("output_size", 1)))
        return s.with_shape((s.n, oh, ow, s.c))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        n, h, w, c = x.shape
        oh = int(node.attr("output_height", node.attr("output_size", 1)))
        ow = int(node.attr("output_width", node.attr("output_size", 1)))
        if h % oh == 0 and w % ow == 0:
            kh, kw = h // oh, w // ow
            y = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
            )
            return y / (kh * kw)
        # Integral image: S[i,j] = sum of x[:i,:j]; region mean via 4 gathers.
        acc = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=1), axis=2)
        acc = jnp.pad(acc, ((0, 0), (1, 0), (1, 0), (0, 0)))
        hs = np.floor(np.arange(oh) * h / oh).astype(np.int32)
        he = np.ceil((np.arange(oh) + 1) * h / oh).astype(np.int32)
        ws = np.floor(np.arange(ow) * w / ow).astype(np.int32)
        we = np.ceil((np.arange(ow) + 1) * w / ow).astype(np.int32)
        a = acc[:, he][:, :, we]
        b_ = acc[:, hs][:, :, we]
        c_ = acc[:, he][:, :, ws]
        d = acc[:, hs][:, :, ws]
        sums = a - b_ - c_ + d
        counts = ((he - hs)[:, None] * (we - ws)[None, :]).astype(np.float32)
        return (sums / counts[None, :, :, None]).astype(x.dtype)
