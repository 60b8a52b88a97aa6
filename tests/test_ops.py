"""Per-operator numerical tests vs the PyTorch oracle.

Mirrors the reference's per-op unit-test tier (demo/test/unittest/:
convolutionTest, depthwiseConv2DTest, poolingTest, batchNormTest,
instanceNormTest, denseTest, upSampleTest, padTest, concatTest,
binaryOpTest, activationTest), with the ncnn naive layers replaced by
torch CPU and thresholds from testutil.h:1194-1195 (0.01 FP32).
"""

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import EngineOptions, Precision
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.ops.common import padding_offsets


def run_graph(graph, inputs, precision=Precision.FP32):
    model = compile_graph(graph, EngineOptions(precision=precision))
    outs = model(
        {k: v for k, v in inputs.items()}
    )
    return {k: np.asarray(v) for k, v in outs.items() if k != "__dumps__"}


def single(graph, x, precision=Precision.FP32):
    model = compile_graph(graph, EngineOptions(precision=precision))
    return np.asarray(model.run_single(x))


@pytest.mark.parametrize("k,stride,padding,cin,cout", [
    (3, 1, "same", 8, 16),
    (3, 2, "same", 4, 8),
    (5, 1, "same", 1, 16),
    (1, 1, "same", 8, 4),
    (3, 1, "valid", 8, 8),
    (4, 2, "same", 4, 4),   # even kernel: reference's asymmetric same-pad
    (2, 2, "valid", 4, 4),
    (7, 2, "same", 3, 12),
    (3, 1, 2, 4, 4),        # explicit numeric padding
])
def test_conv2d_vs_oracle(rng, fp32_threshold, k, stride, padding, cin, cout):
    h, w = 17, 23
    x = rng.standard_normal((2, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32)

    b = GraphBuilder()
    i = b.input(h, w, cin)
    b.conv2d(i, cout, k, stride=stride, padding=padding, weight=wt, bias=bias)
    g = b.build(batch_size=2)

    got = single(g, x)
    pads = padding_offsets(padding, k)
    want = oracle.conv2d(x, wt, bias, stride=stride, pads=pads)
    oracle.compare(got, want, fp32_threshold, f"conv k{k}s{stride}p{padding}")


def test_conv2d_activations(rng, fp32_threshold):
    h, w, cin, cout = 9, 11, 4, 8
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)
    for act in ["relu", "relu6", "leaky_relu", "tanh", "sigmoid", "silu"]:
        b = GraphBuilder()
        i = b.input(h, w, cin)
        wt = rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.3
        b.conv2d(i, cout, 3, activation=act, weight=wt)
        got = single(b.build(), x)
        raw = oracle.conv2d(x, wt, np.zeros(cout, np.float32), 1, padding_offsets("same", 3))
        if act == "relu":
            want = np.maximum(raw, 0)
        elif act == "relu6":
            want = np.clip(raw, 0, 6)
        elif act == "leaky_relu":
            want = np.where(raw >= 0, raw, 0.3 * raw)
        elif act == "tanh":
            want = np.tanh(raw)
        elif act == "sigmoid":
            want = 1 / (1 + np.exp(-raw))
        else:
            want = raw / (1 + np.exp(-raw))
        oracle.compare(got, want, fp32_threshold, f"conv+{act}")


@pytest.mark.parametrize("k,stride,mult", [(3, 1, 1), (3, 2, 1), (5, 1, 2)])
def test_depthwise_vs_oracle(rng, fp32_threshold, k, stride, mult):
    h, w, c = 13, 15, 8
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    wt = rng.standard_normal((k, k, 1, c * mult), dtype=np.float32) * 0.3
    bias = rng.standard_normal(c * mult).astype(np.float32)

    b = GraphBuilder()
    i = b.input(h, w, c)
    b.depthwise(i, k, stride=stride, multiplier=mult, weight=wt)
    g = b.build()
    # overwrite builder's zero bias
    list(g.nodes.values())[1].params["bias"] = bias

    got = single(g, x)
    pads = padding_offsets("same", k)
    want = oracle.depthwise_conv2d(x, wt, bias, stride, pads, mult)
    oracle.compare(got, want, fp32_threshold, f"dwconv k{k}s{stride}m{mult}")


@pytest.mark.parametrize("k,stride,same", [(2, 2, True), (4, 2, True), (3, 2, False), (3, 1, True)])
def test_deconv_vs_oracle(rng, fp32_threshold, k, stride, same):
    h, w, cin, cout = 7, 9, 4, 8
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.3

    b = GraphBuilder()
    i = b.input(h, w, cin)
    b.deconv(i, cout, k, stride=stride, padding="same" if same else "valid", weight=wt)
    g = b.build()

    got = single(g, x)
    want = oracle.conv_transpose2d(x, wt, np.zeros(cout, np.float32), stride, same, k)
    assert got.shape == want.shape, (got.shape, want.shape)
    oracle.compare(got, want, fp32_threshold, f"deconv k{k}s{stride}same={same}")


@pytest.mark.parametrize("k,stride,padding", [(2, 2, "valid"), (3, 2, "same"), (3, 1, "same")])
def test_maxpool_vs_oracle(rng, fp32_threshold, k, stride, padding):
    h, w, c = 12, 14, 6
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.maxpool(i, k, stride, padding)
    got = single(b.build(), x)
    want = oracle.maxpool2d(x, k, stride, padding_offsets(padding, k))
    oracle.compare(got, want, fp32_threshold, f"maxpool k{k}s{stride}")


@pytest.mark.parametrize("k,stride,padding", [(2, 2, "valid"), (3, 2, "same"), (7, 7, "valid")])
def test_avgpool_vs_oracle(rng, fp32_threshold, k, stride, padding):
    h, w, c = 14, 14, 6
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.avgpool(i, k, stride, padding)
    got = single(b.build(), x)
    want = oracle.avgpool2d(x, k, stride, padding_offsets(padding, k))
    oracle.compare(got, want, fp32_threshold, f"avgpool k{k}s{stride}")


@pytest.mark.parametrize("hw,out", [((14, 14), 1), ((14, 14), 7), ((15, 13), 4)])
def test_adaptive_avgpool_vs_oracle(rng, fp32_threshold, hw, out):
    h, w = hw
    c = 5
    x = rng.standard_normal((2, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.adaptive_avgpool(i, out)
    got = single(b.build(batch_size=2), x)
    want = oracle.adaptive_avgpool2d(x, (out, out))
    oracle.compare(got, want, fp32_threshold, f"adaptive {hw}->{out}")


def test_batchnorm_vs_oracle(rng, fp32_threshold):
    h, w, c = 8, 8, 12
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = rng.random(c).astype(np.float32) + 0.5
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.batchnorm(i, gamma, beta, mean, var, epsilon=1e-3)
    g = b.build()
    # fusion would skip (input producer isn't conv); run as-is
    got = single(g, x)
    want = oracle.batchnorm(x, gamma, beta, mean, var, 1e-3)
    oracle.compare(got, want, fp32_threshold, "batchnorm")


def test_instancenorm_vs_oracle(rng, fp32_threshold):
    h, w, c = 16, 16, 6
    x = rng.standard_normal((2, h, w, c), dtype=np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.instancenorm(i, gamma, beta)
    got = single(b.build(batch_size=2), x)
    want = oracle.instancenorm(x, gamma, beta)
    oracle.compare(got, want, fp32_threshold, "instancenorm")


def test_dense_flatten_vs_oracle(rng, fp32_threshold):
    h, w, c, units = 4, 5, 6, 10
    x = rng.standard_normal((3, h, w, c), dtype=np.float32)
    wt = rng.standard_normal((h * w * c, units)).astype(np.float32) * 0.1
    bias = rng.standard_normal(units).astype(np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    f = b.flatten(i)
    b.dense(f, units, weight=wt, bias=bias)
    got = single(b.build(batch_size=3), x)
    want = oracle.dense(x, wt, bias)
    oracle.compare(got, want, fp32_threshold, "flatten+dense")


def test_add_concat(rng, fp32_threshold):
    h, w, c = 6, 7, 4
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    a1 = b.activation(i, "relu")
    a2 = b.activation(i, "sigmoid")
    s = b.add([a1, a2], activation="relu")
    b.concat([s, i])
    g = b.build()
    model = compile_graph(g, EngineOptions())
    got = np.asarray(model.run_single(x))
    r = np.maximum(x, 0)
    sg = 1 / (1 + np.exp(-x))
    want = np.concatenate([np.maximum(r + sg, 0), x], axis=-1)
    oracle.compare(got, want, fp32_threshold, "add+concat")


def test_upsample_nearest(rng, fp32_threshold):
    h, w, c = 5, 6, 3
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.upsample(i, 2, "nearest")
    got = single(b.build(), x)
    want = oracle.upsample_nearest(x, 2)
    oracle.compare(got, want, fp32_threshold, "upsample-nearest")


def test_subpixel(rng, fp32_threshold):
    h, w, r = 5, 7, 2
    c = r * r * 3
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.subpixel(i, r)
    got = single(b.build(), x)
    want = oracle.depth_to_space(x, r)
    oracle.compare(got, want, fp32_threshold, "subpixel")


@pytest.mark.parametrize("mode", ["constant", "reflect", "replicate"])
def test_pad(rng, fp32_threshold, mode):
    h, w, c = 6, 6, 3
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    b = GraphBuilder()
    i = b.input(h, w, c)
    b.pad(i, 1, 2, 2, 1, mode=mode)
    got = single(b.build(), x)
    np_mode = {"constant": "constant", "reflect": "reflect", "replicate": "edge"}[mode]
    want = np.pad(x, ((0, 0), (1, 2), (2, 1), (0, 0)), mode=np_mode)
    oracle.compare(got, want, fp32_threshold, f"pad-{mode}")


def test_unary(rng, fp32_threshold):
    h, w, c = 4, 4, 2
    x = np.abs(rng.standard_normal((1, h, w, c), dtype=np.float32)) + 0.1
    for op, fn in [("abs", np.abs), ("sqrt", np.sqrt), ("exp", np.exp), ("log", np.log)]:
        b = GraphBuilder()
        i = b.input(h, w, c)
        b.unary(i, op)
        got = single(b.build(), x)
        oracle.compare(got, fn(x), fp32_threshold, f"unary-{op}")


def test_bf16_precision_within_fp16_threshold(rng, fp16_threshold):
    """BF16 compute stays within the reference's FP16 tolerance (0.1)."""
    h, w, cin, cout = 16, 16, 8, 8
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.2
    b = GraphBuilder()
    i = b.input(h, w, cin)
    b.conv2d(i, cout, 3, weight=wt)
    g = b.build()
    got = single(g, x, precision=Precision.BF16)
    want = oracle.conv2d(x, wt, np.zeros(cout, np.float32), 1, padding_offsets("same", 3))
    oracle.compare(got, want, fp16_threshold, "conv-bf16")
