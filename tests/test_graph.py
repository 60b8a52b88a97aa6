"""Graph IR tests: topo-sort, shape propagation (Transform semantics),
fusion passes, and INT8 quantization accuracy."""

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import EngineOptions, Precision
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph import fusion
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.graph.ir import Graph, GraphError, Node
from shadernn_tpu.quant.quantize import quantize_graph_weights, quantize_weight


def test_toposort_diamond():
    g = Graph()
    g.add(Node("in", "InputLayer", [], {"height": 8, "width": 8, "channels": 4}))
    g.add(Node("a", "Activation", ["in"], {"activation": "relu"}))
    g.add(Node("b", "Activation", ["in"], {"activation": "sigmoid"}))
    g.add(Node("c", "Add", ["a", "b"], {}))
    g.finalize()
    order = [n.name for n in g.toposort()]
    assert order.index("c") > order.index("a")
    assert order.index("c") > order.index("b")
    assert g.output_names == ["c"]


def test_toposort_deterministic_across_hash_seeds():
    """Kahn's edge lists must not depend on Python hash randomization:
    a multi-input graph's topo order decides the lowered HLO, and any
    run-to-run variation silently defeats the persistent compile cache
    (observed: identical yolov3-tiny builds re-compiling 150-260 s in
    every fresh process). Re-running toposort under different
    PYTHONHASHSEEDs in subprocesses must give one identical order."""
    import subprocess
    import sys

    code = """
from shadernn_tpu.graph.ir import Graph, Node
g = Graph()
g.add(Node("in", "InputLayer", [], {"height": 8, "width": 8, "channels": 4}))
for i in range(6):
    g.add(Node(f"a{i}", "Activation", ["in"], {"activation": "relu"}))
g.add(Node("cat", "Concatenate", [f"a{i}" for i in range(6)], {}))
g.add(Node("add", "Add", ["cat", "cat"], {}))
g.finalize()
print(",".join(n.name for n in g.toposort()))
"""
    orders = set()
    for seed in ("0", "1", "42"):
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env={**__import__("os").environ, "PYTHONHASHSEED": seed,
                 "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-500:]
        orders.add(r.stdout.strip())
    assert len(orders) == 1, orders


def test_duplicate_and_unknown_nodes():
    g = Graph()
    g.add(Node("in", "InputLayer", [], {"height": 8, "width": 8, "channels": 4}))
    with pytest.raises(GraphError):
        g.add(Node("in", "InputLayer", [], {"height": 8, "width": 8, "channels": 4}))
    with pytest.raises(GraphError):
        g.add(Node("x", "Activation", ["nope"], {}))


@pytest.mark.parametrize("h,w,k,s,padding,expect", [
    # floor((H+padT+padB-k)/s)+1 — the reference Transform semantics
    # (conv2d.cpp:162-174); "same" k=3 s=2 on 32 -> 16 (ceil semantics)
    (32, 32, 3, 2, "same", (16, 16)),
    (32, 32, 3, 1, "same", (32, 32)),
    (33, 33, 3, 2, "same", (17, 17)),
    (32, 32, 5, 1, "valid", (28, 28)),
    (32, 32, 4, 2, "same", (16, 16)),
    (32, 32, 2, 2, "same", (16, 16)),
])
def test_conv_shape_transform(h, w, k, s, padding, expect):
    b = GraphBuilder()
    i = b.input(h, w, 4)
    c = b.conv2d(i, 8, k, stride=s, padding=padding)
    g = b.build()
    assert (g.node(c).out_spec.h, g.node(c).out_spec.w) == expect


def test_pool_shape_transform():
    b = GraphBuilder()
    i = b.input(13, 13, 4)
    # reference pool transform: same padding stride 1 keeps size
    p = b.maxpool(i, 2, 1, padding="same")
    g = b.build()
    assert g.node(p).out_spec.shape == (1, 13, 13, 4)


def test_bn_fold_numerics(rng, fp32_threshold):
    h, w, cin, cout = 10, 10, 4, 8
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.3
    gamma = rng.standard_normal(cout).astype(np.float32)
    beta = rng.standard_normal(cout).astype(np.float32)
    mean = rng.standard_normal(cout).astype(np.float32)
    var = rng.random(cout).astype(np.float32) + 0.5

    def make():
        b = GraphBuilder()
        i = b.input(h, w, cin)
        c = b.conv2d(i, cout, 3, weight=wt.copy(), use_bias=False)
        b.batchnorm(c, gamma, beta, mean, var, epsilon=1e-3, activation="relu")
        return b.build()

    g_plain = make()
    y_plain = np.asarray(compile_graph(g_plain, EngineOptions()).run_single(x))

    g_folded = make()
    n = fusion.fold_batchnorm(g_folded)
    assert n == 1
    assert len(g_folded.nodes) == 2  # input + conv (BN removed)
    conv = [nd for nd in g_folded.nodes.values() if nd.op == "Conv2D"][0]
    assert conv.attrs["activation"] == "relu"
    g_folded.infer_shapes()
    y_folded = np.asarray(compile_graph(g_folded, EngineOptions()).run_single(x))
    oracle.compare(y_folded, y_plain, 1e-4, "bn-fold")


def test_activation_fusion():
    b = GraphBuilder()
    i = b.input(8, 8, 4)
    c = b.conv2d(i, 8, 3)
    b.activation(c, "relu")
    g = b.build()
    n = fusion.fuse_activation_into_conv(g)
    assert n == 1
    conv = [nd for nd in g.nodes.values() if nd.op == "Conv2D"][0]
    assert conv.attrs["activation"] == "relu"


def test_int8_weight_quantization(rng):
    w = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    q, s = quantize_weight(w)
    assert q.dtype == np.int8 and s.shape == (1, 1, 1, 32)
    err = np.max(np.abs(q.astype(np.float32) * s - w))
    # per-channel symmetric int8: error bounded by scale/2 per channel
    assert err <= float(np.max(s)) * 0.51


def test_int8_graph_within_fp16_tolerance(rng, fp16_threshold):
    """INT8 weight-only inference stays within the reference's FP16
    accuracy discipline (0.1 max-abs-diff) on a small conv net."""
    h, w, cin = 16, 16, 4
    x = rng.standard_normal((1, h, w, cin), dtype=np.float32)

    def make():
        b = GraphBuilder(seed=1)
        i = b.input(h, w, cin)
        c = b.conv2d(i, 16, 3, activation="relu")
        c2 = b.conv2d(c, 16, 3, activation="relu")
        b.conv2d(c2, 4, 3)
        return b.build()

    y_fp32 = np.asarray(compile_graph(make(), EngineOptions()).run_single(x))
    g = make()
    n = quantize_graph_weights(g)
    assert n == 3
    y_int8 = np.asarray(
        compile_graph(g, EngineOptions(precision=Precision.INT8)).run_single(x)
    )
    oracle.compare(y_int8, y_fp32, fp16_threshold, "int8-graph")


def test_dump_outputs_mode(rng):
    b = GraphBuilder()
    i = b.input(8, 8, 2)
    c = b.conv2d(i, 4, 3, activation="relu")
    b.activation(c, "tanh")
    g = b.build()
    model = compile_graph(g, EngineOptions(dump_outputs=True))
    outs = model({"input": rng.standard_normal((1, 8, 8, 2), dtype=np.float32)})
    dumps = outs["__dumps__"]
    assert set(dumps) == {c, g.output_names[0]}
    assert dumps[c].shape == (1, 8, 8, 4)
