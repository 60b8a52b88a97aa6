"""Direct-API tests for the packed-column chain kernel
(kernels/chain_packed_pallas.py) against a float64 conv oracle: all three
tails, cin in {1, 4, 16} heads (the SpaceToDepth-folded denoiser enters
with cin=4), and the k=9 styletransfer-stem geometry. Engine-level
coverage lives in test_kernels.py (ESPCN d2s2 / denoiser c1 through
compile.py's planner); these pin the kernel's own geometry handling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadernn_tpu.kernels.chain_packed_pallas import (
    build_chain_packed, fused_conv_chain_packed,
)


class FakeNode:
    def __init__(self, k, o, act="relu", w=None, b=None):
        self._a = dict(kernel_size=k, out_channels=o, activation=act,
                       padding="same", stride=1, use_bias=True)
        self.params = dict(weight=w, bias=b)

    def attr(self, key, d=None):
        return self._a.get(key, d)


def conv_ref(x, w, b, act):
    kh, kw, c, o = w.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    n, h, wd, _ = x.shape
    y = np.zeros((n, h, wd, o))
    for dy in range(kh):
        for dx in range(kw):
            y += np.einsum(
                "nhwc,co->nhwo", xp[:, dy : dy + h, dx : dx + wd, :], w[dy, dx]
            )
    y += b
    if act == "relu":
        y = np.maximum(y, 0)
    elif act == "tanh":
        y = np.tanh(y)
    return y


def _build(rng, cfg, cin, dtype, width=64, tail="none"):
    nodes, layers = [], []
    c = cin
    for k, o, act in cfg:
        w = (rng.standard_normal((k, k, c, o)) * 0.25).astype(np.float32)
        b = (rng.standard_normal(o) * 0.1).astype(np.float32)
        nodes.append(FakeNode(k, o, act, w, b))
        layers.append((w, b, act))
        c = o
    built = build_chain_packed(nodes, cin, dtype, width=width, tail=tail)
    assert built is not None
    return built, layers


def _oracle(x, layers):
    ref = x.astype(np.float64)
    for w, b, act in layers:
        ref = conv_ref(ref, w.astype(np.float64), b.astype(np.float64), act)
    return ref


@pytest.mark.parametrize("cin", [1, 4, 16])
def test_packed_chain_c1_tail(rng, cin):
    (lp, specs), layers = _build(
        rng, [(3, 16, "relu"), (3, 8, "relu"), (3, 1, "linear")], cin,
        jnp.float32,
    )
    x = rng.standard_normal((2, 19, 41, cin)).astype(np.float32)
    got = np.asarray(fused_conv_chain_packed(
        jnp.asarray(x), lp, specs, interpret=True, tail="c1"))
    ref = _oracle(x, layers)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_packed_chain_d2s2_tail_bf16(rng, fp16_threshold):
    (lp, specs), layers = _build(
        rng, [(5, 16, "relu"), (3, 16, "relu"), (3, 4, "tanh")], 1,
        jnp.bfloat16, tail="d2s2",
    )
    x = rng.standard_normal((2, 21, 50, 1)).astype(np.float32)
    got = np.asarray(fused_conv_chain_packed(
        jnp.asarray(x, jnp.bfloat16), lp, specs, interpret=True, tail="d2s2"
    ), np.float32)
    ref = _oracle(x, layers)
    n, h, w, _ = ref.shape
    ref = ref.reshape(n, h, w, 2, 2).transpose(0, 1, 3, 2, 4).reshape(
        n, 2 * h, 2 * w, 1
    )
    assert got.shape == ref.shape
    # bf16 intermediates through 3 layers of ~N(0, .25) weights: keep the
    # reference's fp16 discipline scaled by the activation magnitude
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < fp16_threshold


@pytest.mark.parametrize("cfg", [
    [(9, 6, "relu"), (3, 2, "relu")],          # styletransfer-stem k9
    [(5, 16, "relu"), (3, 16, "relu"), (3, 4, "linear")],  # espcn body
])
def test_packed_chain_none_tail(rng, cfg, fp32_threshold):
    (lp, specs), layers = _build(rng, cfg, 1, jnp.float32)
    x = rng.standard_normal((2, 21, 50, 1)).astype(np.float32)
    got = np.asarray(fused_conv_chain_packed(
        jnp.asarray(x), lp, specs, interpret=True, tail="none"))
    ref = _oracle(x, layers)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=fp32_threshold)


# --- a8: int8-activation dots (VERDICT r4 #3) ------------------------------


class FakeNodeQ(FakeNode):
    """Quantized-weight node: per-o-channel symmetric int8 weights plus a
    calibrated input-activation scale attr (what propagate_input_scales
    stamps under an INT8 engine)."""

    def __init__(self, k, o, act, w, b, in_act_scale=0.0):
        super().__init__(k, o, act, w=None, b=b)
        ws = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0  # (o,)
        wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
        self.params = dict(weight_q=wq, weight_scale=ws.astype(np.float32),
                           bias=b)
        self._a["in_act_scale"] = in_act_scale


def conv_ref_a8(x, node, act):
    """Exact emulation of the a8 dot: quantize input symmetrically, int32
    accumulate, dequant by (in_q * weight_scale), bias, activation."""
    in_q = node.attr("in_act_scale")
    wq = node.params["weight_q"].astype(np.int64)
    ws = node.params["weight_scale"].astype(np.float64)
    b = node.params["bias"].astype(np.float64)
    xq = np.clip(np.round(x / in_q), -127, 127)
    kh, kw, c, o = wq.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(xq, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    n, h, wd, _ = x.shape
    acc = np.zeros((n, h, wd, o))
    for dy in range(kh):
        for dx in range(kw):
            acc += np.einsum(
                "nhwc,co->nhwo", xp[:, dy : dy + h, dx : dx + wd, :],
                wq[dy, dx].astype(np.float64),
            )
    y = acc * (in_q * ws) + b
    if act == "relu":
        y = np.maximum(y, 0)
    elif act == "tanh":
        y = np.tanh(y)
    return y


def test_packed_chain_a8_int8_dots(rng):
    """Mixed chain: float head (c=1 stays on the f32 dot), two calibrated
    int8 x int8 layers; exact vs a quantization-aware oracle."""
    w0 = (rng.standard_normal((5, 5, 1, 16)) * 0.25).astype(np.float32)
    b0 = (rng.standard_normal(16) * 0.1).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, 16, 16)) * 0.25).astype(np.float32)
    b1 = (rng.standard_normal(16) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, 16, 8)) * 0.25).astype(np.float32)
    b2 = (rng.standard_normal(8) * 0.1).astype(np.float32)

    x = rng.standard_normal((2, 19, 41, 1)).astype(np.float32)
    # oracle pass 1: float ranges for the calibration scales
    y0 = conv_ref(x.astype(np.float64), w0, b0, "relu")
    q1 = float(np.max(np.abs(y0))) / 127.0
    n0 = FakeNode(5, 16, "relu", w0, b0)
    n1 = FakeNodeQ(3, 16, "relu", w1, b1, in_act_scale=q1)
    y1 = conv_ref_a8(y0, n1, "relu")
    q2 = float(np.max(np.abs(y1))) / 127.0
    n2 = FakeNodeQ(3, 8, "tanh", w2, b2, in_act_scale=q2)
    ref = conv_ref_a8(y1, n2, "tanh")

    built = build_chain_packed([n0, n1, n2], 1, jnp.float32, width=41,
                               tail="none", a8=True)
    assert built is not None
    lp, specs = built
    assert specs[0].in_q == 0.0  # c=1 head stays on the float dot
    assert specs[1].in_q == pytest.approx(q1)
    assert specs[2].in_q == pytest.approx(q2)
    assert lp[1]["wmat"].dtype == jnp.int8
    got = np.asarray(fused_conv_chain_packed(
        jnp.asarray(x), lp, specs, interpret=True, tail="none"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_packed_chain_a8_static_tanh_range(rng):
    """A tanh producer gives the consumer a STATIC [-1,1] bound: a8 must
    engage with in_q = 1/127 and no calibration attr."""
    w0 = (rng.standard_normal((3, 3, 16, 16)) * 0.25).astype(np.float32)
    b0 = (rng.standard_normal(16) * 0.1).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, 16, 8)) * 0.25).astype(np.float32)
    b1 = (rng.standard_normal(8) * 0.1).astype(np.float32)
    n0 = FakeNode(3, 16, "tanh", w0, b0)
    n1 = FakeNodeQ(3, 8, "linear", w1, b1)  # no in_act_scale attr
    built = build_chain_packed([n0, n1], 16, jnp.float32, width=41,
                               tail="none", a8=True)
    assert built is not None
    _lp, specs = built
    assert specs[1].in_q == pytest.approx(1.0 / 127.0)
