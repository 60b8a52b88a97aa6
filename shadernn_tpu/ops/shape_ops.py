"""Shape/layout ops: Flatten, UpSampling2D, Pad (ZeroPadding2D), Subpixel.

Reference: core/src/ic2/{flattenlayer*, upsampling2d*, padlayer*,
subpixelmerge*}. The reference's Flatten undoes its C4 texture layout
(cpulayer.h flatten2d); here NHWC is the native layout so a plain reshape
matches Keras Flatten ordering directly.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from shadernn_tpu.graph.ir import Node, TensorSpec, Transform, transform_output_dims
from shadernn_tpu.ops.common import padding_offsets
from shadernn_tpu.ops.registry import OpDef, RunCtx, register


@register("Flatten")
class Flatten(OpDef):
    """NHWC -> (N, H*W*C). Marks the reference's "flatten boundary"
    (dp.cpp:356-370) after which layers were CPU-run; here everything stays
    in the same XLA program."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        import numpy as np

        s = in_specs[0]
        return s.with_shape((s.n, int(np.prod(s.shape[1:]))))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        return x.reshape(x.shape[0], -1)


@register("UpSampling2D", "Upsample")
class UpSampling2D(OpDef):
    """Nearest/bilinear resize by integer scale (upsampling2d.h:40 transform:
    scale, scale, 0, 0; upsampling2dGL.cpp:31,77)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        f = float(node.attr("scale", 2))
        t = Transform(scale_w=f, scale_h=f)
        h, w = transform_output_dims(t, in_specs)
        return s.with_shape((s.n, h, w, s.c))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        f = int(node.attr("scale", 2))
        interp = str(node.attr("interpolation", "nearest")).lower()
        n, h, w, c = x.shape
        if interp == "nearest":
            return jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
        if interp in ("bilinear", "linear"):
            # TF/Keras half_pixel_centers=False bilinear (align_corners=False,
            # legacy) to match the converter's UpSampling2D semantics.
            return jax.image.resize(x, (n, h * f, w * f, c), method="bilinear")
        raise ValueError(f"unknown interpolation {interp!r}")


@register("ZeroPadding2D", "Pad", "Padding")
class Pad(OpDef):
    """Constant / reflect / replicate padding layer (padlayerGL.cpp:60,124)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        t, b, l, r = self._pads(node)
        return s.with_shape((s.n, s.h + t + b, s.w + l + r, s.c))

    @staticmethod
    def _pads(node: Node):
        if "padding" in node.attrs:
            return padding_offsets(node.attrs["padding"], 0)
        return tuple(int(node.attr(k, 0)) for k in ("pad_top", "pad_bottom", "pad_left", "pad_right"))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        t, b, l, r = self._pads(node)
        mode = str(node.attr("mode", "constant")).lower()
        widths = ((0, 0), (t, b), (l, r), (0, 0))
        if mode in ("constant", "zero"):
            return jnp.pad(x, widths, constant_values=float(node.attr("value", 0.0)))
        if mode == "reflect":
            return jnp.pad(x, widths, mode="reflect")
        if mode in ("replicate", "edge", "symmetric"):
            return jnp.pad(x, widths, mode="edge")
        raise ValueError(f"unknown pad mode {mode!r}")


@register("Subpixel", "DepthToSpace", "PixelShuffle")
class Subpixel(OpDef):
    """depth_to_space / pixel shuffle for super-resolution heads
    (subpixelmerge.h:41 transform: scale=k; subpixelmergeGL.cpp:31,78).

    attrs['scale'] is the upscale factor r; C must be divisible by r*r.
    Channel order follows TF depth_to_space (what Keras ESPCN uses).
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        r = int(node.attr("scale", 2))
        assert s.c % (r * r) == 0, f"Subpixel: C={s.c} not divisible by {r*r}"
        return s.with_shape((s.n, s.h * r, s.w * r, s.c // (r * r)))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        r = int(node.attr("scale", 2))
        n, h, w, c = x.shape
        co = c // (r * r)
        x = x.reshape(n, h, w, r, r, co)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, r, w, r, co
        return x.reshape(n, h * r, w * r, co)


@register("SpaceToDepth")
class SpaceToDepth(OpDef):
    """Inverse of Subpixel (TF space_to_depth, block-major channel order:
    out[..., (by*bs+bx)*C + c] = in[n, i*bs+by, j*bs+bx, c]).

    Used by the stride-2 conv folding pass (graph/fusion.py): a stride-2
    conv becomes SpaceToDepth + a stride-1 conv with block-rearranged
    weights, making it eligible for the stride-1 pallas chain format.
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        r = int(node.attr("scale", 2))
        assert s.h % r == 0 and s.w % r == 0, (
            f"SpaceToDepth: {s.h}x{s.w} not divisible by {r}"
        )
        return s.with_shape((s.n, s.h // r, s.w // r, s.c * r * r))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        r = int(node.attr("scale", 2))
        n, h, w, c = x.shape
        x = x.reshape(n, h // r, r, w // r, r, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h/r, w/r, by, bx, c
        return x.reshape(n, h // r, w // r, c * r * r)
