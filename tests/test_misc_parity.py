"""Parity odds and ends: multi-input conv (reference multiInputsTest),
ingest resize (imageTextureResizeTest analog), unary op values."""

import numpy as np

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph.ir import Graph, Node
from shadernn_tpu.ops.common import padding_offsets


def test_multi_input_conv(rng, fp32_threshold):
    """Conv2D with use_multi_inputs: extra inputs channel-concatenated
    before the conv (reference modelparser use_multi_inputs +
    multiInputsTest)."""
    h, w = 10, 12
    g = Graph()
    g.add(Node("a", "InputLayer", [], {"height": h, "width": w, "channels": 3}))
    g.add(Node("b", "InputLayer", [], {"height": h, "width": w, "channels": 5,
                                       "index": 1}))
    wt = rng.standard_normal((3, 3, 8, 4)).astype(np.float32) * 0.3
    g.add(Node("conv", "Conv2D", ["a", "b"],
               {"kernel_size": 3, "stride": 1, "padding": "same",
                "out_channels": 4, "use_multi_inputs": True, "use_bias": False},
               {"weight": wt}))
    g.finalize()
    g.infer_shapes()

    xa = rng.random((1, h, w, 3), dtype=np.float32)
    xb = rng.random((1, h, w, 5), dtype=np.float32)
    model = compile_graph(g, EngineOptions())
    got = np.asarray(model({"a": xa, "b": xb})["conv"])
    want = oracle.conv2d(np.concatenate([xa, xb], -1), wt, None, 1,
                         padding_offsets("same", 3))
    oracle.compare(got, want, fp32_threshold, "multi-input-conv")


def test_ingest_resize(rng):
    """On-device resize in the ingest pipeline (the reference's GPU
    texture resize, imageTextureGL resize compute shader)."""
    from shadernn_tpu.image.ingest import ingest_frames

    frames = (rng.random((2, 20, 30, 3)) * 255).astype(np.uint8)
    out = np.asarray(ingest_frames(
        frames, target_hw=(10, 15), dtype_name="float32"
    ))
    assert out.shape == (2, 10, 15, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # nearest-mode too
    out2 = np.asarray(ingest_frames(
        frames, target_hw=(40, 60), dtype_name="float32",
        resize_method="nearest",
    ))
    assert out2.shape == (2, 40, 60, 3)
    np.testing.assert_allclose(out2[:, ::2, ::2], out2[:, 1::2, 1::2])


def test_unary_scalar_ops(rng):
    from shadernn_tpu.graph.builder import GraphBuilder

    x = rng.random((1, 4, 4, 2), dtype=np.float32) + 0.5
    for op, val, fn in [("mul", 2.5, lambda a: a * 2.5),
                       ("add", -1.0, lambda a: a - 1.0),
                       ("pow", 2.0, lambda a: a**2)]:
        b = GraphBuilder()
        i = b.input(4, 4, 2)
        b.unary(i, op, op_value=val)
        got = np.asarray(compile_graph(b.build(), EngineOptions()).run_single(x))
        np.testing.assert_allclose(got, fn(x), atol=1e-6)
