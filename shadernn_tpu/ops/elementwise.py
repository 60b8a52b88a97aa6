"""Elementwise / structural ops: InputLayer, Add, Concatenate, Activation,
Unary, Calculate.

Reference: core/src/ic2/{inputlayer.h, addlayer*, concatenation*,
activation*, unary*, calculation*}. All are identity shape transforms
except Concatenate (channel concat).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from shadernn_tpu.graph.ir import Node, TensorSpec
from shadernn_tpu.ops.common import apply_activation
from shadernn_tpu.ops.registry import OpDef, RunCtx, register


@register("InputLayer")
class InputLayer(OpDef):
    """Placeholder carrying input index/shape (reference inputlayer.h:1-49).
    Never executed — the engine binds model inputs directly."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        raise AssertionError("InputLayer shapes are set by Graph.infer_shapes")

    def run(self, node: Node, xs: List, ctx: RunCtx):
        raise AssertionError("InputLayer is bound by the engine, not run")


@register("Add")
class Add(OpDef):
    """Elementwise residual add + optional activation (addlayerGL.cpp:31)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        return in_specs[0]

    def run(self, node: Node, xs: List, ctx: RunCtx):
        y = xs[0]
        for x in xs[1:]:
            y = y + x
        return apply_activation(
            y, node.attr("activation", "linear"), float(node.attr("leaky_alpha", 0.3))
        )


@register("Concatenate", "Concat")
class Concatenate(OpDef):
    """Channel concatenation (concatenationGL.cpp:31)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        s = in_specs[0]
        c = sum(sp.c for sp in in_specs)
        return s.with_shape((*s.shape[:-1], c))

    def run(self, node: Node, xs: List, ctx: RunCtx):
        return jnp.concatenate(xs, axis=-1)


@register("Activation", "ReLU", "LeakyReLU")
class Activation(OpDef):
    """Standalone activation layer (activationGL.cpp:33)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        return in_specs[0]

    def run(self, node: Node, xs: List, ctx: RunCtx):
        kind = node.attr("activation", node.attr("kind", "relu"))
        return apply_activation(xs[0], kind, float(node.attr("leaky_alpha", 0.3)))


_UNARY_FNS = {
    "abs": jnp.abs,
    "neg": jnp.negative,
    "sqrt": jnp.sqrt,
    "rsqrt": jax.lax.rsqrt,
    "square": jnp.square,
    "exp": jnp.exp,
    "log": jnp.log,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "reciprocal": jnp.reciprocal,
}


@register("Unary")
class Unary(OpDef):
    """Elementwise unary function selected by attrs['op_type']
    (reference unary.h:26-35 UnaryDesc.opType; unaryGL.cpp:32)."""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        return in_specs[0]

    def run(self, node: Node, xs: List, ctx: RunCtx):
        op = str(node.attr("op_type", "abs")).lower()
        x = xs[0]
        if op in ("mul", "scale"):
            return x * float(node.attr("op_value", 1.0))
        if op in ("add", "shift"):
            return x + float(node.attr("op_value", 0.0))
        if op == "pow":
            return jnp.power(x, float(node.attr("op_value", 1.0)))
        if op == "clip":
            lo, hi = node.attr("clip_range", (0.0, 1.0))
            return jnp.clip(x, lo, hi)
        if op not in _UNARY_FNS:
            raise ValueError(f"unknown unary op_type {op!r}")
        return _UNARY_FNS[op](x)


@register("Calculate")
class Calculate(OpDef):
    """Image-pipeline merge op (reference calculation.h / calculationGL.cpp:
    recombines a processed luma plane with chroma, e.g. denoised Y + UV).

    attrs['expr'] selects the recombination:
      'merge_y_uv': inputs (y:[...,1], uv_src:[...,C>=3]) -> [y, uv[1:]]
      'add': elementwise add of the two inputs
      'mul': elementwise multiply
    """

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        expr = str(node.attr("expr", "merge_y_uv"))
        if expr == "merge_y_uv":
            s = in_specs[1]
            return s
        return in_specs[0]

    def run(self, node: Node, xs: List, ctx: RunCtx):
        expr = str(node.attr("expr", "merge_y_uv"))
        if expr == "merge_y_uv":
            y, src = xs[0], xs[1]
            return jnp.concatenate([y[..., :1], src[..., 1:]], axis=-1)
        if expr == "add":
            return xs[0] + xs[1]
        if expr == "mul":
            return xs[0] * xs[1]
        raise ValueError(f"unknown Calculate expr {expr!r}")
