"""Graph-level optimizations: BatchNorm folding and constant-ish fusions.

The reference fuses Conv2D+BatchNorm+Activation into a single generated
shader at model-load time (docs/Operators.md:11, conv2dGL.cpp:666-747).
Here the same fusion is done once on the Graph:

- `fold_batchnorm`: folds a conv's attached BN statistics (or a standalone
  following BatchNormalization node) directly into the conv weights/bias,
  removing the runtime epilogue entirely. Works for Conv2D,
  SeparableConv2D and Conv2DTranspose (per-output-channel scaling).
- `fuse_activation_into_conv`: moves a following Activation node's
  nonlinearity into the conv's fused epilogue when the conv is its only
  consumer and has no activation of its own.

XLA would fuse the arithmetic anyway; folding at graph level additionally
shrinks the program (fewer HLO ops) and makes INT8 weight quantization see
the final effective weights.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from shadernn_tpu.graph.ir import Graph, Node

_CONV_OPS = ("Conv2D", "SeparableConv2D", "Conv2DTranspose")


def _fold_bn_into_weights(node: Node, gamma, beta, mean, var, eps: float) -> None:
    """w' = w * s_o, b' = (b - mean) * s_o + beta with s_o = gamma/sqrt(var+eps).

    Weight layouts put the output channel last (HWIO / HW1(C*m) / HWIO),
    so scaling the trailing axis is correct for all three conv flavors.
    For Conv2DTranspose HWIO has O in axis -1 as well.
    """
    s = gamma / np.sqrt(var + eps)
    if "weight_q" in node.params:
        # INT8 storage keeps int weights; fold into the per-channel scale.
        node.params["weight_scale"] = node.params["weight_scale"] * s.astype(np.float32)
    else:
        node.params["weight"] = (node.params["weight"] * s).astype(np.float32)
    bias = node.params.get("bias", np.zeros_like(mean))
    node.params["bias"] = ((bias - mean) * s + beta).astype(np.float32)
    node.attrs["use_bias"] = True
    node.attrs["use_batchnorm"] = False
    for k in ("bn_gamma", "bn_beta", "bn_mean", "bn_variance"):
        node.params.pop(k, None)


def fold_batchnorm(graph: Graph) -> int:
    """Fold BN into conv weights. Returns number of folds performed."""
    folds = 0
    # 1. BN attached to the conv itself (JSON useBatchNormalization=True).
    for n in graph.nodes.values():
        if n.op in _CONV_OPS and n.attr("use_batchnorm", False) and "bn_gamma" in n.params:
            _fold_bn_into_weights(
                n,
                n.params["bn_gamma"].astype(np.float64),
                n.params["bn_beta"].astype(np.float64),
                n.params["bn_mean"].astype(np.float64),
                n.params["bn_variance"].astype(np.float64),
                float(n.attr("bn_epsilon", 1e-3)),
            )
            folds += 1

    # 2. Standalone BatchNormalization immediately after a conv that is its
    #    only consumer and applies no activation before the BN.
    to_remove = []
    for n in list(graph.nodes.values()):
        if n.op != "BatchNormalization" or "gamma" not in n.params:
            continue
        if n.attr("activation", "linear") not in ("linear", "", None):
            act_moves = True  # BN's activation moves onto the conv
        else:
            act_moves = False
        (src_name,) = n.inputs
        src = graph.nodes[src_name]
        if src.op not in _CONV_OPS:
            continue
        if src.attr("activation", "linear") not in ("linear", "", None):
            continue  # conv already activates before BN; cannot fold past it
        if len(graph.consumers(src_name)) != 1:
            continue
        _fold_bn_into_weights(
            src,
            n.params["gamma"].astype(np.float64),
            n.params["beta"].astype(np.float64),
            n.params["mean"].astype(np.float64),
            n.params["variance"].astype(np.float64),
            float(n.attr("epsilon", 1e-3)),
        )
        if act_moves:
            src.attrs["activation"] = n.attr("activation")
            src.attrs["leaky_alpha"] = n.attr("leaky_alpha", 0.3)
        to_remove.append(n.name)
        folds += 1

    _remove_passthrough(graph, to_remove)
    return folds


def fuse_activation_into_conv(graph: Graph) -> int:
    """Merge a lone Activation node into its producing conv/add/dense."""
    fusable_producers = _CONV_OPS + ("Dense", "Add", "BatchNormalization")
    to_remove = []
    for n in list(graph.nodes.values()):
        if n.op != "Activation" or len(n.inputs) != 1:
            continue
        src = graph.nodes[n.inputs[0]]
        if src.op not in fusable_producers:
            continue
        if src.attr("activation", "linear") not in ("linear", "", None):
            continue
        if len(graph.consumers(src.name)) != 1:
            continue
        src.attrs["activation"] = n.attr("activation", n.attr("kind", "relu"))
        src.attrs["leaky_alpha"] = n.attr("leaky_alpha", 0.3)
        to_remove.append(n.name)
    _remove_passthrough(graph, to_remove)
    return len(to_remove)


def fold_pad_into_conv(graph: Graph) -> int:
    """Merge a zero-constant ZeroPadding2D into its sole consuming conv's
    explicit padding (the reference's converter emits Pad+Conv pairs; the
    conv shader handles the offsets itself, padlayer + conv2d
    getPaddingOffset). Keeps pallas conv chains unbroken."""
    from shadernn_tpu.ops.common import padding_offsets
    from shadernn_tpu.ops.shape_ops import Pad as PadOp

    removed = []
    for n in list(graph.nodes.values()):
        if n.op != "ZeroPadding2D":
            continue
        if str(n.attr("mode", "constant")).lower() not in ("constant", "zero"):
            continue
        if float(n.attr("value", 0.0)) != 0.0:
            continue
        consumers = graph.consumers(n.name)
        if len(consumers) != 1 or consumers[0].op != "Conv2D":
            continue
        if n.name in graph.output_names:
            continue
        conv = consumers[0]
        pt, pb, pl_, pr = PadOp._pads(n)
        k = int(conv.attr("kernel_size"))
        ct, cb, cl, cr = padding_offsets(conv.attr("padding", "same"), k)
        conv.attrs["padding"] = (pt + ct, pb + cb, pl_ + cl, pr + cr)
        removed.append(n.name)
    _remove_passthrough(graph, removed)
    return len(removed)


# Ops that permute/reshape elements without changing values: an elementwise
# activation commutes with them.
_PERMUTATION_OPS = ("Subpixel", "Flatten")


def fuse_activation_through_permutation(graph: Graph) -> int:
    """Move Activation(permute(conv(x))) -> permute(conv+act(x)): lets the
    activation ride the conv's fused epilogue (e.g. ESPCN's tanh after
    depth_to_space lands in the chain kernel's last layer)."""
    moved = []
    for n in list(graph.nodes.values()):
        if n.op != "Activation" or len(n.inputs) != 1:
            continue
        perm = graph.nodes[n.inputs[0]]
        if perm.op not in _PERMUTATION_OPS or len(graph.consumers(perm.name)) != 1:
            continue
        src = graph.nodes[perm.inputs[0]]
        if src.op not in _CONV_OPS + ("Dense",):
            continue
        if src.attr("activation", "linear") not in ("linear", "", None):
            continue
        if len(graph.consumers(src.name)) != 1:
            continue
        src.attrs["activation"] = n.attr("activation", "linear")
        src.attrs["leaky_alpha"] = n.attr("leaky_alpha", 0.3)
        moved.append(n.name)
    _remove_passthrough(graph, moved)
    return len(moved)


def _remove_passthrough(graph: Graph, names) -> None:
    """Remove single-input nodes, rewiring consumers to their producer."""
    for name in names:
        node = graph.nodes[name]
        (src,) = node.inputs
        for consumer in graph.consumers(name):
            consumer.inputs = [src if i == name else i for i in consumer.inputs]
        graph.output_names = [src if o == name else o for o in graph.output_names]
        del graph.nodes[name]


def optimize(graph: Graph, fold_bn: bool = True) -> Dict[str, int]:
    """Run the standard pipeline; returns fusion counts for logging."""
    stats = {}
    if fold_bn:
        stats["batchnorm_folds"] = fold_batchnorm(graph)
    stats["activation_fusions"] = fuse_activation_into_conv(graph)
    stats["pad_folds"] = fold_pad_into_conv(graph)
    stats["permuted_activation_fusions"] = fuse_activation_through_permutation(graph)
    return stats
