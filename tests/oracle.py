"""Reference oracle implementations (PyTorch CPU), replacing the ncnn naive
layers the reference tests compare against (demo/test/unittest/
convolutionTest.cpp:29-60). All take/return NHWC numpy float32.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _to_nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x)).permute(0, 3, 1, 2)


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.permute(0, 2, 3, 1).contiguous().numpy()


def conv2d(x, w_hwio, bias=None, stride=1, pads=(0, 0, 0, 0)):
    """pads = (top, bottom, left, right)."""
    t, b, l, r = pads
    xt = _to_nchw(x)
    xt = F.pad(xt, (l, r, t, b))
    wt = torch.from_numpy(np.ascontiguousarray(w_hwio)).permute(3, 2, 0, 1)  # OIHW
    bt = torch.from_numpy(np.asarray(bias, np.float32)) if bias is not None else None
    y = F.conv2d(xt, wt, bt, stride=stride)
    return _to_nhwc(y)


def depthwise_conv2d(x, w_hw1o, bias=None, stride=1, pads=(0, 0, 0, 0), multiplier=1):
    t, b, l, r = pads
    c = x.shape[-1]
    xt = _to_nchw(x)
    xt = F.pad(xt, (l, r, t, b))
    # w: (kh, kw, 1, C*m) -> torch groups=C wants (C*m, 1, kh, kw)
    wt = torch.from_numpy(np.ascontiguousarray(w_hw1o)).permute(3, 2, 0, 1)
    bt = torch.from_numpy(np.asarray(bias, np.float32)) if bias is not None else None
    y = F.conv2d(xt, wt, bt, stride=stride, groups=c)
    return _to_nhwc(y)


def conv_transpose2d(x, w_hwio, bias=None, stride=1, same=True, kernel_size=None):
    """Matches reference deconv shape semantics: out = s*H (same) or
    s*H + (k-s) (valid)."""
    k = kernel_size or w_hwio.shape[0]
    xt = _to_nchw(x)
    # torch wants (in, out, kh, kw)
    wt = torch.from_numpy(np.ascontiguousarray(w_hwio)).permute(2, 3, 0, 1)
    bt = torch.from_numpy(np.asarray(bias, np.float32)) if bias is not None else None
    y = F.conv_transpose2d(xt, wt, bt, stride=stride)
    if same:
        # TF/Keras SAME deconv: out = s*H, cropped from the full VALID
        # output with pad_before = pad_total//2 (gradient of SAME conv).
        h, w_in = x.shape[1], x.shape[2]
        oh, ow = stride * h, stride * w_in
        pt = (y.shape[2] - oh) // 2
        pl = (y.shape[3] - ow) // 2
        y = y[:, :, pt : pt + oh, pl : pl + ow]
    return _to_nhwc(y)


def maxpool2d(x, k, stride, pads=(0, 0, 0, 0)):
    t, b, l, r = pads
    xt = _to_nchw(x)
    xt = F.pad(xt, (l, r, t, b), value=float("-inf"))
    y = F.max_pool2d(xt, k, stride)
    return _to_nhwc(y)


def avgpool2d(x, k, stride, pads=(0, 0, 0, 0)):
    t, b, l, r = pads
    xt = _to_nchw(x)
    ones = torch.ones_like(xt[:, :1])
    xt = F.pad(xt, (l, r, t, b))
    ones = F.pad(ones, (l, r, t, b))
    sums = F.avg_pool2d(xt, k, stride, divisor_override=1)
    counts = F.avg_pool2d(ones, k, stride, divisor_override=1)
    return _to_nhwc(sums / counts)


def adaptive_avgpool2d(x, out_hw):
    y = F.adaptive_avg_pool2d(_to_nchw(x), out_hw)
    return _to_nhwc(y)


def batchnorm(x, gamma, beta, mean, var, eps=1e-3):
    scale = gamma / np.sqrt(var + eps)
    return x * scale + (beta - mean * scale)


def instancenorm(x, gamma=None, beta=None, eps=1e-5):
    xt = _to_nchw(x)
    y = F.instance_norm(
        xt,
        weight=torch.from_numpy(np.asarray(gamma, np.float32)) if gamma is not None else None,
        bias=torch.from_numpy(np.asarray(beta, np.float32)) if beta is not None else None,
        eps=eps,
    )
    return _to_nhwc(y)


def dense(x, w, bias=None):
    y = x.reshape(x.shape[0], -1) @ w
    if bias is not None:
        y = y + bias
    return y


def upsample_nearest(x, scale):
    return _to_nhwc(F.interpolate(_to_nchw(x), scale_factor=scale, mode="nearest"))


def depth_to_space(x, r):
    """TF-order depth_to_space on NHWC."""
    n, h, w, c = x.shape
    y = x.reshape(n, h, w, r, r, c // (r * r))
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h * r, w * r, c // (r * r))


def apply_activation_np(x, kind, alpha=0.3):
    kind = (kind or "linear").lower()
    if kind in ("linear", "", "none"):
        return x
    if kind == "relu":
        return np.maximum(x, 0)
    if kind == "relu6":
        return np.clip(x, 0, 6)
    if kind in ("leaky_relu", "leakyrelu"):
        return np.where(x >= 0, x, alpha * x)
    if kind == "tanh":
        return np.tanh(x)
    if kind == "sigmoid":
        return 1 / (1 + np.exp(-x))
    if kind in ("silu", "swish"):
        return x / (1 + np.exp(-x))
    if kind == "softmax":
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)
    raise ValueError(kind)


def oracle_execute(graph, inputs):
    """Execute a shadernn_tpu Graph with pure torch/numpy reference ops —
    the generic ncnn-style oracle for layer-dump validation (the
    reference's tier-2 harness walks dumped layers against ncnn,
    resnet18Test.cpp:87-152). Returns {node_name: activation}."""
    from shadernn_tpu.ops.common import padding_offsets

    env = dict(inputs)
    for node in graph.toposort():
        if node.op == "InputLayer":
            continue
        xs = [env[i] for i in node.inputs]
        a = node.attrs
        act = a.get("activation", "linear")
        alpha = float(a.get("leaky_alpha", 0.3))
        if node.op == "Conv2D":
            x = np.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
            k = int(a["kernel_size"])
            pads = padding_offsets(a.get("padding", "same"), k)
            bias = node.params.get("bias") if a.get("use_bias", True) else None
            y = conv2d(x, node.params["weight"], bias, int(a.get("stride", 1)), pads)
            if a.get("use_batchnorm") and "bn_gamma" in node.params:
                y = batchnorm(y, node.params["bn_gamma"], node.params["bn_beta"],
                              node.params["bn_mean"], node.params["bn_variance"],
                              float(a.get("bn_epsilon", 1e-3)))
            y = apply_activation_np(y, act, alpha)
        elif node.op == "SeparableConv2D":
            k = int(a["kernel_size"])
            pads = padding_offsets(a.get("padding", "same"), k)
            bias = node.params.get("bias") if a.get("use_bias", True) else None
            y = depthwise_conv2d(xs[0], node.params["weight"], bias,
                                 int(a.get("stride", 1)), pads,
                                 int(a.get("multiplier", 1)))
            if a.get("use_batchnorm") and "bn_gamma" in node.params:
                y = batchnorm(y, node.params["bn_gamma"], node.params["bn_beta"],
                              node.params["bn_mean"], node.params["bn_variance"],
                              float(a.get("bn_epsilon", 1e-3)))
            y = apply_activation_np(y, act, alpha)
        elif node.op == "Conv2DTranspose":
            k = int(a["kernel_size"])
            from shadernn_tpu.ops.common import is_same_padding

            bias = node.params.get("bias") if a.get("use_bias", True) else None
            y = conv_transpose2d(xs[0], node.params["weight"], bias,
                                 int(a.get("stride", 1)),
                                 is_same_padding(a.get("padding", "same")), k)
            y = apply_activation_np(y, act, alpha)
        elif node.op == "MaxPooling2D":
            k = int(a["kernel_size"])
            y = maxpool2d(xs[0], k, int(a["stride"]),
                          padding_offsets(a.get("padding", "valid"), k))
        elif node.op == "AveragePooling2D":
            k = int(a["kernel_size"])
            y = avgpool2d(xs[0], k, int(a["stride"]),
                          padding_offsets(a.get("padding", "valid"), k))
        elif node.op == "AdaptiveAvgPool2d":
            y = adaptive_avgpool2d(
                xs[0], (int(a.get("output_height", 1)), int(a.get("output_width", 1))))
        elif node.op == "BatchNormalization":
            y = batchnorm(xs[0], node.params["gamma"], node.params["beta"],
                          node.params["mean"], node.params["variance"],
                          float(a.get("epsilon", 1e-3)))
            y = apply_activation_np(y, act, alpha)
        elif node.op == "InstanceNormalization":
            y = instancenorm(xs[0], node.params.get("gamma"),
                             node.params.get("beta"), float(a.get("epsilon", 1e-5)))
            y = apply_activation_np(y, act, alpha)
        elif node.op == "Add":
            y = apply_activation_np(sum(xs), act, alpha)
        elif node.op == "Concatenate":
            y = np.concatenate(xs, axis=-1)
        elif node.op == "Activation":
            y = apply_activation_np(xs[0], a.get("activation", "relu"), alpha)
        elif node.op == "Flatten":
            y = xs[0].reshape(xs[0].shape[0], -1)
        elif node.op == "Dense":
            x = xs[0].reshape(xs[0].shape[0], -1)
            bias = node.params.get("bias") if a.get("use_bias", True) else None
            y = dense(x, node.params["weight"], bias)
            y = apply_activation_np(y, act, alpha)
        elif node.op == "UpSampling2D":
            y = upsample_nearest(xs[0], int(a.get("scale", 2)))
        elif node.op == "ZeroPadding2D":
            from shadernn_tpu.ops.shape_ops import Pad as PadOp

            t, b, l, r = PadOp._pads(node)
            mode = {"constant": "constant", "reflect": "reflect",
                    "replicate": "edge"}.get(str(a.get("mode", "constant")), "constant")
            y = np.pad(xs[0], ((0, 0), (t, b), (l, r), (0, 0)), mode=mode)
        elif node.op == "Subpixel":
            y = depth_to_space(xs[0], int(a.get("scale", 2)))
        else:
            raise ValueError(f"oracle_execute: unsupported op {node.op}")
        env[node.name] = np.asarray(y, np.float32)
    return env


def compare(a, b, threshold=0.01, name=""):
    """Max-abs-diff comparison like CompareMat (testutil.h:1194)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    diff = float(np.max(np.abs(a - b))) if a.size else 0.0
    assert diff <= threshold, f"{name}: max abs diff {diff} > {threshold}"
    return diff
