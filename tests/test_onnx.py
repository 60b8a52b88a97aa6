"""ONNX importer tests: hand-encoded ModelProto bytes -> Graph -> engine,
compared against a torch oracle built from the same weights (the
reference's ONNX conversion path, tools/convertTool ONNXToJson)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import onnx_encoder as enc
import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.tools.convert import convert_onnx_graph
from shadernn_tpu.tools.onnx_reader import parse_onnx


def _run(graph, x_nhwc):
    model = compile_graph(graph, EngineOptions())
    return np.asarray(model.run_single(x_nhwc))


def test_conv_relu_model(rng, fp32_threshold):
    w1 = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2  # OIHW
    b1 = rng.standard_normal(8).astype(np.float32)
    data = enc.model(
        nodes=[
            enc.node("Conv", ["x", "w1", "b1"], ["c1"], attrs=[
                enc.attr_ints("kernel_shape", [3, 3]),
                enc.attr_ints("strides", [1, 1]),
                enc.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            enc.node("Relu", ["c1"], ["r1"]),
        ],
        initializers=[enc.tensor("w1", w1), enc.tensor("b1", b1)],
        inputs=[enc.value_info("x", [1, 3, 12, 14])],
        outputs=[enc.value_info("r1", [1, 8, 12, 14])],
    )
    og = parse_onnx(data)
    assert [n.op_type for n in og.nodes] == ["Conv", "Relu"]
    g = convert_onnx_graph(og)

    x = rng.standard_normal((1, 12, 14, 3)).astype(np.float32)
    got = _run(g, x)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.relu(F.conv2d(xt, torch.from_numpy(w1), torch.from_numpy(b1), padding=1))
    want = want.permute(0, 2, 3, 1).numpy()
    oracle.compare(got, want, fp32_threshold, "onnx-conv-relu")


def test_classifier_with_gemm_reorder(rng, fp32_threshold):
    """NCHW-flatten -> Gemm weight reorder must match torch exactly."""
    c, h, w = 4, 6, 6
    w1 = rng.standard_normal((c, 3, 3, 3)).astype(np.float32) * 0.3
    wg = rng.standard_normal((10, c * h * w)).astype(np.float32) * 0.1  # (units, CHW)
    bg = rng.standard_normal(10).astype(np.float32)
    data = enc.model(
        nodes=[
            enc.node("Conv", ["x", "w1"], ["c1"], attrs=[
                enc.attr_ints("kernel_shape", [3, 3]),
                enc.attr_ints("strides", [1, 1]),
                enc.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            enc.node("Relu", ["c1"], ["r1"]),
            enc.node("Flatten", ["r1"], ["f1"]),
            enc.node("Gemm", ["f1", "wg", "bg"], ["out"], attrs=[
                enc.attr_int("transB", 1),
            ]),
        ],
        initializers=[enc.tensor("w1", w1), enc.tensor("wg", wg), enc.tensor("bg", bg)],
        inputs=[enc.value_info("x", [1, 3, h, w])],
        outputs=[enc.value_info("out", [1, 10])],
    )
    g = convert_onnx_graph(parse_onnx(data))
    x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    got = _run(g, x)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    feat = F.relu(F.conv2d(xt, torch.from_numpy(w1), padding=1)).flatten(1)
    want = (feat @ torch.from_numpy(wg).T + torch.from_numpy(bg)).numpy()
    oracle.compare(got, want, fp32_threshold, "onnx-gemm")


def test_style_transfer_like_ops(rng, fp32_threshold):
    """InstanceNorm + ConvTranspose + Add residual (the candy-9 op set)."""
    c = 4
    w1 = rng.standard_normal((c, c, 3, 3)).astype(np.float32) * 0.3  # conv OIHW
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    wd = rng.standard_normal((c, c, 4, 4)).astype(np.float32) * 0.2  # deconv (C,O,kh,kw)
    data = enc.model(
        nodes=[
            enc.node("Conv", ["x", "w1"], ["c1"], attrs=[
                enc.attr_ints("kernel_shape", [3, 3]),
                enc.attr_ints("strides", [1, 1]),
                enc.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            enc.node("InstanceNormalization", ["c1", "g", "b"], ["n1"], attrs=[
                enc.attr_float("epsilon", 1e-5),
            ]),
            enc.node("Add", ["x", "n1"], ["a1"]),
            enc.node("ConvTranspose", ["a1", "wd"], ["d1"], attrs=[
                enc.attr_ints("kernel_shape", [4, 4]),
                enc.attr_ints("strides", [2, 2]),
                enc.attr_ints("pads", [1, 1, 1, 1]),
            ]),
        ],
        initializers=[enc.tensor("w1", w1), enc.tensor("g", gamma),
                      enc.tensor("b", beta), enc.tensor("wd", wd)],
        inputs=[enc.value_info("x", [1, c, 8, 8])],
        outputs=[enc.value_info("d1", [1, c, 16, 16])],
    )
    g = convert_onnx_graph(parse_onnx(data))
    x = rng.standard_normal((1, 8, 8, c)).astype(np.float32)
    got = _run(g, x)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    c1 = F.conv2d(xt, torch.from_numpy(w1), padding=1)
    n1 = F.instance_norm(c1, weight=torch.from_numpy(gamma),
                         bias=torch.from_numpy(beta), eps=1e-5)
    a1 = xt + n1
    d1 = F.conv_transpose2d(a1, torch.from_numpy(wd), stride=2, padding=1)
    want = d1.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    oracle.compare(got, want, fp32_threshold, "onnx-style-ops")


def test_pool_and_depthwise(rng, fp32_threshold):
    c = 6
    wdw = rng.standard_normal((c, 1, 3, 3)).astype(np.float32) * 0.3
    data = enc.model(
        nodes=[
            enc.node("Conv", ["x", "wdw"], ["c1"], attrs=[
                enc.attr_ints("kernel_shape", [3, 3]),
                enc.attr_ints("strides", [1, 1]),
                enc.attr_ints("pads", [1, 1, 1, 1]),
                enc.attr_int("group", c),
            ]),
            enc.node("MaxPool", ["c1"], ["p1"], attrs=[
                enc.attr_ints("kernel_shape", [2, 2]),
                enc.attr_ints("strides", [2, 2]),
            ]),
            enc.node("GlobalAveragePool", ["p1"], ["gap"]),
        ],
        initializers=[enc.tensor("wdw", wdw)],
        inputs=[enc.value_info("x", [1, c, 8, 8])],
        outputs=[enc.value_info("gap", [1, c, 1, 1])],
    )
    g = convert_onnx_graph(parse_onnx(data))
    x = rng.standard_normal((2, 8, 8, c)).astype(np.float32)
    model = compile_graph(g, EngineOptions(batch_size=2))
    got = np.asarray(model.run_single(x))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    c1 = F.conv2d(xt, torch.from_numpy(wdw), padding=1, groups=c)
    p1 = F.max_pool2d(c1, 2)
    want = F.adaptive_avg_pool2d(p1, 1).permute(0, 2, 3, 1).numpy()
    oracle.compare(got, want, fp32_threshold, "onnx-dw-pool")
