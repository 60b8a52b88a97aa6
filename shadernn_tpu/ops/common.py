"""Shared op helpers: padding arithmetic and activation functions.

Padding reproduces `Conv2DLayer::getPaddingOffset`
(core/src/ic2/conv2d.cpp:69-105): the spec may be digit strings / ints
(explicit), "valid"/"none" (zero), or "same"-style keywords, with the
reference's quirky even-kernel asymmetry (top/left get one less).

Activations match the vocabulary of the reference's shader epilogues and
CPU activation map (core/src/ic2/cpulayer.h): relu, relu6, leaky_relu,
tanh, sigmoid, silu/swish, softmax, linear.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

PadSpec = Union[str, int, Sequence[int]]


def padding_offsets(padding: PadSpec, kernel_size: int) -> Tuple[int, int, int, int]:
    """Return (top, bottom, left, right) pad amounts.

    Mirrors getPaddingOffset (conv2d.cpp:69-105; identical logic in
    maxpool2d.cpp:37-70):
      - explicit digits: taken as given
      - "valid"/"none": zero
      - otherwise ("same"): max(k//2, 1) on each side for k>1, and for even
        k the top/left side is reduced by one; k<=1 pads zero.
    """
    if isinstance(padding, (list, tuple)):
        if len(padding) == 2:  # (vertical, horizontal)
            t = b = int(padding[0])
            l = r = int(padding[1])
            return (t, b, l, r)
        if len(padding) == 4:
            return tuple(int(p) for p in padding)  # type: ignore[return-value]
        raise ValueError(f"bad padding tuple {padding}")
    if isinstance(padding, (int, float)):
        p = int(padding)
        return (p, p, p, p)
    s = str(padding)
    if s.isdigit():
        p = int(s)
        return (p, p, p, p)
    if s in ("valid", "none"):
        return (0, 0, 0, 0)
    # "same" and anything else non-digit (reference treats all remaining
    # strings as same-style padding).
    k = kernel_size
    if k <= 1:
        return (0, 0, 0, 0)
    p = max(k // 2, 1)
    t, b_, l, r = p, p, p, p
    if k % 2 == 0:
        t -= 1
        l -= 1
    return (t, b_, l, r)


def is_same_padding(padding: PadSpec) -> bool:
    if isinstance(padding, str):
        return not padding.isdigit() and padding not in ("valid", "none")
    return False


def conv_output_hw(
    h: int, w: int, k: int, stride: int, pads: Tuple[int, int, int, int]
) -> Tuple[int, int]:
    t, b, l, r = pads
    return ((h + t + b - k) // stride + 1, (w + l + r - k) // stride + 1)


# ---------------------------------------------------------------------------
# Activations

def apply_activation(x, kind: str, alpha: float = 0.3):
    """Fused activation epilogue.

    Vocabulary and default leaky alpha (0.3) follow the reference
    (modelparser.cpp getConvolutionLayer: leakyReluAlpha fallback 0.3;
    shader epilogues in conv2dGL.cpp:666-747).
    """
    kind = (kind or "linear").lower()
    if kind in ("linear", "", "none", "identity"):
        return x
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if kind in ("leakyrelu", "leaky_relu", "leaky relu"):
        return jnp.where(x >= 0, x, alpha * x)
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind in ("silu", "swish"):
        return x * jax.nn.sigmoid(x)
    if kind == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if kind == "gelu":
        return jax.nn.gelu(x)
    raise ValueError(f"unknown activation {kind!r}")


ACTIVATIONS = (
    "linear relu relu6 leaky_relu tanh sigmoid silu swish softmax gelu".split()
)
