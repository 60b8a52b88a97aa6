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


def test_stride2_conv_folds_to_s2d(rng, fp32_threshold):
    """fold_stride2_convs: stride-2 Conv2D == SpaceToDepth + stride-1
    Conv2D with block-rearranged weights, exactly, for odd/even kernels."""
    from shadernn_tpu.graph.fusion import fold_stride2_convs
    from shadernn_tpu.graph.ir import Graph, Node

    # (kernel, padding, folds?) — folds only inside the pallas-regime gate
    # (2 <= k2 <= 4 and channels small); k=1/k=2 give k2=1 and stay put.
    for k, padding, folds in [(3, "same", 1), (5, "same", 1), (4, "same", 1),
                              (1, "valid", 0), (3, "valid", 1), (2, "same", 0)]:
        g = Graph()
        g.add(Node("in", "InputLayer", [], {"height": 12, "width": 16,
                                            "channels": 3}))
        w = rng.standard_normal((k, k, 3, 8)).astype(np.float32) * 0.3
        b = rng.standard_normal((8,)).astype(np.float32)
        g.add(Node("c", "Conv2D", ["in"], {
            "kernel_size": k, "stride": 2, "padding": padding,
            "out_channels": 8, "activation": "relu", "use_bias": True,
        }, {"weight": w.copy(), "bias": b}))
        g.finalize()
        g.infer_shapes()
        x = rng.random((2, 12, 16, 3), dtype=np.float32)
        want = np.asarray(compile_graph(g, EngineOptions()).run_single(x))

        n = fold_stride2_convs(g)
        assert n == folds, (k, padding, n)
        if folds:
            assert g.nodes["c"].attrs["stride"] == 1
            assert "c_s2d" in g.nodes
        got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
        assert got.shape == want.shape, (k, padding, got.shape, want.shape)
        oracle.compare(got, want, 1e-5, f"stride2-fold-k{k}-{padding}")


def test_stride2_fold_skips_odd_spatial():
    from shadernn_tpu.graph.fusion import fold_stride2_convs
    from shadernn_tpu.graph.ir import Graph, Node

    g = Graph()
    g.add(Node("in", "InputLayer", [], {"height": 13, "width": 16,
                                        "channels": 1}))
    g.add(Node("c", "Conv2D", ["in"], {
        "kernel_size": 3, "stride": 2, "padding": "same",
        "out_channels": 4, "use_bias": False,
    }, {"weight": np.ones((3, 3, 1, 4), np.float32)}))
    g.finalize()
    assert fold_stride2_convs(g) == 0
    assert g.nodes["c"].attrs["stride"] == 2


def test_deconv2_folds_to_conv_subpixel(rng):
    """fold_deconv2_convs: stride-2 SAME Conv2DTranspose == stride-1
    Conv2D (4x channels, parity-rearranged weights) + Subpixel, exactly."""
    from shadernn_tpu.graph.fusion import fold_deconv2_convs
    from shadernn_tpu.graph.ir import Graph, Node

    # O=4 so 4*O=16 sits inside the pallas-regime gate; k=2 gives k2=1
    # and is expected to stay put.
    for k, folds in [(2, 0), (3, 1), (4, 1), (5, 1)]:
        g = Graph()
        g.add(Node("in", "InputLayer", [], {"height": 6, "width": 7,
                                            "channels": 3}))
        w = rng.standard_normal((k, k, 3, 4)).astype(np.float32) * 0.3
        b = rng.standard_normal((4,)).astype(np.float32)
        g.add(Node("d", "Conv2DTranspose", ["in"], {
            "kernel_size": k, "stride": 2, "padding": "same",
            "out_channels": 4, "activation": "relu", "use_bias": True,
        }, {"weight": w.copy(), "bias": b}))
        g.finalize()
        g.infer_shapes()
        x = rng.random((2, 6, 7, 3), dtype=np.float32)
        want = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
        assert fold_deconv2_convs(g) == folds, k
        if folds:
            assert g.nodes["d"].op == "Subpixel"
        got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
        assert got.shape == want.shape
        oracle.compare(got, want, 1e-5, f"deconv2-fold-k{k}")


def test_fold_passes_whole_models(rng):
    """Optimized engines (stride-2 + deconv folds active) match the
    unoptimized graphs end to end on the models that exercise them."""
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models import build_model

    cases = [
        ("unet", dict(h=32, w=32, base_filters=8, depth=2), (1, 32, 32, 1)),
        ("styletransfer", dict(h=32, w=32, num_res_blocks=1), (1, 32, 32, 3)),
        ("aidenoise", dict(h=32, w=64), (1, 32, 64, 1)),
    ]
    for name, kw, shape in cases:
        want_eng = Engine.from_graph(
            build_model(name, **kw), EngineOptions(), optimize=False
        )
        got_eng = Engine.from_graph(build_model(name, **kw), EngineOptions())
        x = rng.random(shape, dtype=np.float32)
        want = np.asarray(want_eng.run_single(x))
        got = np.asarray(got_eng.run_single(x))
        assert got.shape == want.shape, name
        oracle.compare(got, want, 1e-4, f"fold-passes-{name}")
