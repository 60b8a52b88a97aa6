"""Pad-fold and permuted-activation fusion pass tests."""

import numpy as np

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph import fusion
from shadernn_tpu.graph.builder import GraphBuilder


def test_pad_folds_into_conv(rng, fp32_threshold):
    def make():
        b = GraphBuilder(seed=5)
        i = b.input(10, 12, 3)
        p = b.pad(i, 2, 2, 1, 1)
        b.conv2d(p, 4, 3, padding="valid")
        return b.build()

    g_plain = make()
    x = rng.random((1, 10, 12, 3), dtype=np.float32)
    want = np.asarray(compile_graph(g_plain, EngineOptions()).run_single(x))

    g = make()
    n = fusion.fold_pad_into_conv(g)
    assert n == 1
    assert all(nd.op != "ZeroPadding2D" for nd in g.nodes.values())
    conv = [nd for nd in g.nodes.values() if nd.op == "Conv2D"][0]
    assert conv.attrs["padding"] == (2, 2, 1, 1)
    g.infer_shapes()
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    oracle.compare(got, want, 1e-5, "pad-fold")


def test_reflect_pad_not_folded():
    b = GraphBuilder()
    i = b.input(8, 8, 2)
    p = b.pad(i, 1, 1, 1, 1, mode="reflect")
    b.conv2d(p, 4, 3, padding="valid")
    g = b.build()
    assert fusion.fold_pad_into_conv(g) == 0


def test_activation_moves_through_subpixel(rng):
    def make():
        b = GraphBuilder(seed=6)
        i = b.input(8, 10, 2)
        c = b.conv2d(i, 8, 3)
        s = b.subpixel(c, 2)
        b.activation(s, "tanh")
        return b.build()

    g_plain = make()
    x = rng.random((1, 8, 10, 2), dtype=np.float32)
    want = np.asarray(compile_graph(g_plain, EngineOptions()).run_single(x))

    g = make()
    n = fusion.fuse_activation_through_permutation(g)
    assert n == 1
    conv = [nd for nd in g.nodes.values() if nd.op == "Conv2D"][0]
    assert conv.attrs["activation"] == "tanh"
    assert all(nd.op != "Activation" for nd in g.nodes.values())
    g.infer_shapes()
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    oracle.compare(got, want, 1e-5, "act-through-subpixel")


def test_espcn_end_to_end_with_all_passes(rng, fp32_threshold):
    """Engine.from_graph applies all passes; ESPCN's tanh lands on conv_3
    and numerics stay identical."""
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models import build_model

    x = rng.random((1, 16, 24, 1), dtype=np.float32)
    g1 = build_model("espcn", h=16, w=24)
    want = np.asarray(
        compile_graph(g1, EngineOptions()).run_single(x)
    )
    eng = Engine.from_graph(build_model("espcn", h=16, w=24), EngineOptions())
    conv3 = eng.graph.nodes["conv_3"]
    assert conv3.attrs["activation"] == "tanh"
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, fp32_threshold, "espcn-all-passes")
