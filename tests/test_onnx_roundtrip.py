"""ONNX round-trip of the whole model zoo.

Every zoo builder is exported to real ONNX ModelProto bytes
(tools/onnx_export.py), re-imported through the converter
(tools/convert.py:convert_onnx_graph via the wire-format reader), and the
two graphs must produce identical outputs. This exercises the importer
against the full reference layer vocabulary (reference convertTool ONNX
handlers, tools/convertTool/) instead of hand-rolled fragments.
"""

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.models import build_model
from shadernn_tpu.tools.convert import convert_onnx_graph
from shadernn_tpu.tools.onnx_export import export_onnx
from shadernn_tpu.tools.onnx_reader import parse_onnx

# (model, build kwargs, input hw) — small spatial dims for CPU CI speed.
ZOO = [
    ("espcn", dict(h=16, w=24)),
    ("aidenoise", dict(h=32, w=32)),
    ("spatialdenoise", dict(h=16, w=24)),
    ("styletransfer", dict(h=32, w=32)),
    ("unet", dict(h=32, w=32, base_filters=8)),
    ("mobilenetv2", dict(h=32, w=32)),
    ("resnet18", dict()),
    ("yolov3-tiny", dict(h=64, w=64)),
]


def _strip_yolo(g):
    """The YOLO decode head has no ONNX analog (the reference also runs it
    outside the converted graph, yololayer.cpp); compare the conv feature
    maps feeding it instead."""
    yolo = [n for n in g.nodes.values() if n.op == "YOLO"]
    if not yolo:
        return g
    (node,) = yolo
    del g.nodes[node.name]
    g.finalize(node.inputs)
    return g


@pytest.mark.parametrize("name,kw", ZOO, ids=[z[0] for z in ZOO])
def test_zoo_onnx_roundtrip(name, kw, rng, fp32_threshold):
    g1 = _strip_yolo(build_model(name, **kw))
    g1.infer_shapes()
    data = export_onnx(g1)

    og = parse_onnx(data)
    g2 = convert_onnx_graph(og)

    in_name = g1.input_names[0]
    spec = g1.nodes[in_name].out_spec
    x = rng.random((1, *spec.shape[1:]), dtype=np.float32)

    m1 = compile_graph(g1, EngineOptions())
    m2 = compile_graph(g2, EngineOptions())
    o1 = m1({in_name: x})
    o2 = m2({g2.input_names[0]: x})
    outs1 = [np.asarray(o1[k]) for k in g1.output_names]
    outs2 = [np.asarray(o2[k]) for k in g2.output_names]
    assert len(outs1) == len(outs2)
    for a, b in zip(outs1, outs2):
        assert a.shape == b.shape, (name, a.shape, b.shape)
        oracle.compare(b, a, fp32_threshold, f"onnx-roundtrip-{name}")


def test_export_bytes_are_real_onnx(tmp_path):
    """The exported bytes parse as a ModelProto with graph/initializers."""
    g = build_model("espcn", h=8, w=8)
    p = tmp_path / "espcn.onnx"
    export_onnx(g, str(p))
    og = parse_onnx(p.read_bytes())
    assert og.nodes and og.initializers
    assert any(n.op_type == "Conv" for n in og.nodes)
    assert any(n.op_type == "DepthToSpace" for n in og.nodes)


def test_convert_cli_onnx(tmp_path, rng, fp32_threshold):
    """convertTool flag surface: .onnx in -> artifact out -> engine runs it
    (reference ModelConversion.md:19-33 flow)."""
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.tools.convert import main as convert_main

    g = build_model("espcn", h=16, w=16)
    g.infer_shapes()
    onnx_path = tmp_path / "espcn.onnx"
    export_onnx(g, str(onnx_path))
    out_path = tmp_path / "espcn.json"
    convert_main(["-f", str(onnx_path), "-o", str(out_path)])
    eng = Engine.from_json(out_path, EngineOptions())
    x = rng.random((1, 16, 16, 1), dtype=np.float32)
    want = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, fp32_threshold, "onnx-cli-roundtrip")
