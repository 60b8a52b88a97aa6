"""Pallas kernel tests (interpret mode on CPU) vs the XLA/oracle paths.

The analog of the reference's compute-shader-vs-fragment-shader matrix
(demo/unit_test.sh runs every op with --use_compute): the PALLAS backend
must match the XLA backend within the reference FP32 threshold.
"""

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import BackendKind, EngineOptions, Precision
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.ops.common import padding_offsets


def run_backend(graph, x, backend, precision=Precision.FP32):
    model = compile_graph(graph, EngineOptions(precision=precision, backend=backend))
    return np.asarray(model.run_single(x))


@pytest.mark.parametrize("k,stride,cin,cout,hw", [
    (3, 1, 8, 16, (12, 20)),
    (5, 1, 1, 16, (10, 16)),
    (1, 1, 16, 4, (8, 8)),
    (3, 2, 8, 8, (12, 20)),
    (9, 1, 3, 8, (16, 16)),
    (4, 2, 4, 4, (12, 12)),
])
def test_pallas_conv_matches_oracle(rng, fp32_threshold, k, stride, cin, cout, hw):
    h, w = hw
    x = rng.standard_normal((2, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32)

    b = GraphBuilder()
    i = b.input(h, w, cin)
    b.conv2d(i, cout, k, stride=stride, activation="relu", weight=wt, bias=bias)
    g = b.build(batch_size=2)

    got = run_backend(g, x, BackendKind.PALLAS)
    pads = padding_offsets("same", k)
    want = np.maximum(oracle.conv2d(x, wt, bias, stride=stride, pads=pads), 0)
    oracle.compare(got, want, fp32_threshold, f"pallas-conv k{k}s{stride}")


def test_pallas_conv_bn_epilogue(rng, fp32_threshold):
    """BN folded into the kernel's scale/offset epilogue."""
    h, w, cin, cout = 10, 14, 4, 8
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)

    b = GraphBuilder()
    i = b.input(h, w, cin)
    c = b.conv2d(i, cout, 3, use_bias=False)
    b.batchnorm(c, rng.standard_normal(cout).astype(np.float32),
                rng.standard_normal(cout).astype(np.float32),
                rng.standard_normal(cout).astype(np.float32),
                (rng.random(cout) + 0.5).astype(np.float32),
                activation="relu")
    g = b.build()

    want = run_backend(g, x, BackendKind.XLA)
    got = run_backend(g, x, BackendKind.PALLAS)
    oracle.compare(got, want, fp32_threshold, "pallas-conv-bn")


def test_pallas_conv_int8(rng, fp16_threshold):
    """INT8 weight dequant fused in the kernel epilogue."""
    from shadernn_tpu.quant.quantize import quantize_graph_weights

    h, w, cin, cout = 12, 16, 8, 16
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)

    def make():
        b = GraphBuilder(seed=3)
        i = b.input(h, w, cin)
        b.conv2d(i, cout, 3, activation="relu")
        return b.build()

    want = run_backend(make(), x, BackendKind.XLA)
    g = make()
    quantize_graph_weights(g)
    got = run_backend(g, x, BackendKind.PALLAS, precision=Precision.INT8)
    oracle.compare(got, want, fp16_threshold, "pallas-conv-int8")


def test_pallas_dense(rng, fp32_threshold):
    m, kdim, n = 4, 40, 10
    x = rng.standard_normal((m, 5, 4, 2), dtype=np.float32)
    wt = rng.standard_normal((kdim, n)).astype(np.float32) * 0.2
    bias = rng.standard_normal(n).astype(np.float32)

    b = GraphBuilder()
    i = b.input(5, 4, 2)
    f = b.flatten(i)
    b.dense(f, n, activation="tanh", weight=wt, bias=bias)
    g = b.build(batch_size=m)

    got = run_backend(g, x, BackendKind.PALLAS)
    want = np.tanh(oracle.dense(x, wt, bias))
    oracle.compare(got, want, fp32_threshold, "pallas-dense")


def test_pallas_espcn_end_to_end(rng, fp32_threshold):
    """Whole ESPCN through the PALLAS backend (non-conv ops fall back)."""
    from shadernn_tpu.models import build_model

    x = rng.random((1, 16, 24, 1), dtype=np.float32)
    g1 = build_model("espcn", h=16, w=24)
    want = run_backend(g1, x, BackendKind.XLA)
    g2 = build_model("espcn", h=16, w=24)
    got = run_backend(g2, x, BackendKind.PALLAS)
    oracle.compare(got, want, fp32_threshold, "pallas-espcn")


def test_pallas_int8_fused_chain(rng, fp16_threshold):
    """INT8 weights through the fused chain kernel (dequant inside the
    chain, per-layer) stays within the reference bf16/int8 tolerance."""
    from shadernn_tpu.models import build_model
    from shadernn_tpu.quant.quantize import quantize_graph_weights

    x = rng.random((1, 16, 24, 1), dtype=np.float32)
    want = run_backend(build_model("espcn", h=16, w=24), x, BackendKind.XLA)
    g = build_model("espcn", h=16, w=24)
    quantize_graph_weights(g)
    got = run_backend(g, x, BackendKind.PALLAS, precision=Precision.INT8)
    oracle.compare(got, want, fp16_threshold, "int8-fused-chain")


def test_pallas_fused_matmul_direct(rng, fp32_threshold):
    """Direct kernel API with shapes that need padding on every axis."""
    from shadernn_tpu.kernels.matmul_pallas import fused_matmul

    x = rng.standard_normal((37, 100), dtype=np.float32)
    w = rng.standard_normal((100, 23), dtype=np.float32) * 0.1
    scale = (rng.random(23) + 0.5).astype(np.float32)
    offset = rng.standard_normal(23).astype(np.float32)
    got = np.asarray(
        fused_matmul(x, w, scale, offset, activation="sigmoid", interpret=True)
    )
    want = 1 / (1 + np.exp(-((x @ w) * scale + offset)))
    oracle.compare(got, want, fp32_threshold, "fused-matmul")


def test_chain_tail_c1(rng, fp32_threshold):
    """o=1 chain head writes the 2D-row tail; matches the XLA backend."""
    from shadernn_tpu.config import BackendKind, EngineOptions, Precision
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models import build_model

    x = rng.random((2, 24, 32, 1), dtype=np.float32)
    want = np.asarray(Engine.from_graph(
        build_model("spatialdenoise", h=24, w=32, features=8, depth=3),
        EngineOptions(precision=Precision.FP32, backend=BackendKind.XLA,
                      batch_size=2),
    ).run_single(x))
    got = np.asarray(Engine.from_graph(
        build_model("spatialdenoise", h=24, w=32, features=8, depth=3),
        EngineOptions(precision=Precision.FP32, backend=BackendKind.PALLAS,
                      batch_size=2),
    ).run_single(x))
    oracle.compare(got, want, fp32_threshold, "chain-tail-c1")


def test_chain_tail_d2s2(rng, fp16_threshold):
    """ESPCN bf16: the fused depth_to_space tail (uint32 lane pairs)
    matches the XLA backend within the bf16 tolerance."""
    from shadernn_tpu.config import BackendKind, EngineOptions, Precision
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models import build_model

    x = rng.random((2, 24, 32, 1), dtype=np.float32)
    want = np.asarray(Engine.from_graph(
        build_model("espcn", h=24, w=32),
        EngineOptions(precision=Precision.FP32, backend=BackendKind.XLA,
                      batch_size=2),
    ).run_single(x))
    got = np.asarray(Engine.from_graph(
        build_model("espcn", h=24, w=32),
        EngineOptions(precision=Precision.BF16, backend=BackendKind.PALLAS,
                      batch_size=2),
    ).run_single(x))
    assert got.shape == want.shape == (2, 48, 64, 1)
    oracle.compare(got, want, fp16_threshold, "chain-tail-d2s2")


def test_chain_folds_trailing_activation():
    """A sole-consumer Activation after the chain tail (ESPCN's
    post-subpixel tanh_out) is folded into the kernel's f32 epilogue:
    the chain plan claims the node and the output still matches XLA
    (covered numerically by test_chain_tail_d2s2)."""
    from shadernn_tpu.config import BackendKind, EngineOptions, Precision
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    m = compile_graph(
        build_model("espcn", h=24, w=32),
        EngineOptions(precision=Precision.BF16, backend=BackendKind.PALLAS,
                      batch_size=2),
    )
    plan = m.forward.chain_plan
    assert any("tanh_out" in members for members in plan.values()), plan


def test_chain_folds_activation_specified_via_kind():
    """An Activation node that carries only a `kind` attribute (the op's
    alternate spelling, ops/elementwise.py:70) folds exactly like one
    carrying `activation` — the fold detection mirrors the op's own
    attribute lookup (ADVICE r2)."""
    from shadernn_tpu.config import BackendKind, EngineOptions, Precision
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    g = build_model("espcn", h=24, w=32)
    act = g.nodes["tanh_out"]
    act.attrs.pop("activation")
    act.attrs["kind"] = "tanh"
    m = compile_graph(
        g,
        EngineOptions(precision=Precision.BF16, backend=BackendKind.PALLAS,
                      batch_size=2),
    )
    plan = m.forward.chain_plan
    assert any("tanh_out" in members for members in plan.values()), plan
