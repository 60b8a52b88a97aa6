"""Normalization ops: BatchNormalization, InstanceNorm.

Reference: core/src/ic2/batchnorm*.cpp (standalone BN, also foldable into a
preceding conv) and instancenorm*.cpp (CS-only on GL). BN uses stored
moving statistics; instance norm computes per-(sample, channel) statistics
over H,W at run time.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from shadernn_tpu.graph.ir import Node, TensorSpec
from shadernn_tpu.ops.common import apply_activation
from shadernn_tpu.ops.registry import OpDef, RunCtx, register


@register("BatchNormalization", "BatchNorm")
class BatchNormalization(OpDef):
    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        return in_specs[0]

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        import jax.lax

        eps = float(node.attr("epsilon", 1e-3))
        g = jnp.asarray(node.params["gamma"], jnp.float32)
        b = jnp.asarray(node.params["beta"], jnp.float32)
        m = jnp.asarray(node.params["mean"], jnp.float32)
        v = jnp.asarray(node.params["variance"], jnp.float32)
        scale = g * jax.lax.rsqrt(v + eps)
        offset = b - m * scale
        y = x * scale.astype(x.dtype) + offset.astype(x.dtype)
        return apply_activation(
            y, node.attr("activation", "linear"), float(node.attr("leaky_alpha", 0.3))
        )


@register("InstanceNormalization", "InstanceNorm")
class InstanceNormalization(OpDef):
    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        return in_specs[0]

    def run(self, node: Node, xs: List, ctx: RunCtx):
        x = xs[0]
        eps = float(node.attr("epsilon", 1e-5))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax_rsqrt(var + eps)
        if "gamma" in node.params:
            y = y * jnp.asarray(node.params["gamma"], jnp.float32)
        if "beta" in node.params:
            y = y + jnp.asarray(node.params["beta"], jnp.float32)
        y = y.astype(x.dtype)
        return apply_activation(
            y, node.attr("activation", "linear"), float(node.attr("leaky_alpha", 0.3))
        )


def jax_rsqrt(x):
    import jax.lax

    return jax.lax.rsqrt(x)
