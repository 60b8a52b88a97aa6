"""Artifact round-trip tests: Graph -> ShaderNN JSON(+bin) -> Graph must
reproduce identical inference results (the reference's two-tier model
format, modelparser.cpp:238-260 monolithic vs decoupled)."""

import json

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.graph.parser import parse_model_file
from shadernn_tpu.graph.serialize import save_model
from shadernn_tpu.models import build_model


def _roundtrip(graph, tmp_path, decouple):
    save_model(graph, str(tmp_path / "model.json"), decouple=decouple)
    if decouple:
        return parse_model_file(tmp_path / "model_layers.json")
    return parse_model_file(tmp_path / "model.json")


@pytest.mark.parametrize("decouple", [False, True])
@pytest.mark.parametrize("model_name,kwargs", [
    ("espcn", {"h": 16, "w": 24}),
    ("resnet18", {}),
    ("styletransfer", {"h": 32, "w": 32, "num_res_blocks": 1}),
    ("unet", {"h": 32, "w": 32, "base_filters": 4, "depth": 2}),
])
def test_roundtrip_inference_identical(tmp_path, rng, decouple, model_name, kwargs):
    g = build_model(model_name, **kwargs)
    spec = g.nodes[g.input_names[0]].out_spec
    x = rng.random((1, *spec.shape[1:]), dtype=np.float32)

    want = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    g2 = _roundtrip(g, tmp_path, decouple)
    g2.infer_shapes()
    got = np.asarray(compile_graph(g2, EngineOptions()).run_single(x))
    oracle.compare(got, want, 1e-5, f"roundtrip-{model_name}-decouple={decouple}")


def test_mobilenet_roundtrip_with_depthwise(tmp_path, rng):
    g = build_model("mobilenetv2", h=32, w=32, num_classes=10)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    want = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    g2 = _roundtrip(g, tmp_path, True)
    g2.infer_shapes()
    got = np.asarray(compile_graph(g2, EngineOptions()).run_single(x))
    oracle.compare(got, want, 1e-5, "roundtrip-mobilenetv2")


def test_engine_from_json(tmp_path, rng):
    g = build_model("espcn", h=16, w=24)
    save_model(g, str(tmp_path / "espcn.json"))
    eng = Engine.from_json(tmp_path / "espcn.json")
    y = eng.run_single(rng.random((1, 16, 24, 1), dtype=np.float32))
    assert np.asarray(y).shape == (1, 32, 48, 1)


def test_json_schema_fields(tmp_path):
    """Spot-check reference schema fields (conv2d.py converter emission)."""
    g = build_model("espcn", h=16, w=24)
    save_model(g, str(tmp_path / "m.json"))
    m = json.load(open(tmp_path / "m.json"))
    assert m["numLayers"]["count"] == len(g.nodes)
    l0 = m["Layer_0"]
    assert l0["type"] == "InputLayer" and "Input Width" in l0
    conv = m["Layer_1"]
    assert conv["type"] == "Conv2D"
    for key in ("kernel_size", "padding", "strides", "outputPlanes", "useBias",
                "weights", "useBatchNormalization", "activation"):
        assert key in conv, key
    assert isinstance(conv["useBias"], str)  # "True"/"False" strings
    assert len(conv["weights"]["kernel"]) == 5 * 5 * 1 * 16
