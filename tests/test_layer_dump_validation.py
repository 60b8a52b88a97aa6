"""Model-level layer-dump validation: run each zoo model with per-layer
capture and compare EVERY layer against the torch/numpy oracle interpreter
— the reference's tier-2 harness (dump with --dump_outputs, then a second
pass replays the model in ncnn and diffs each dumped layer,
resnet18Test.cpp:87-152), generalized to any graph."""

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import BackendKind, EngineOptions, Precision
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.models import build_model


def _layer_dumps(graph, x, backend=BackendKind.XLA):
    model = compile_graph(
        graph, EngineOptions(dump_outputs=True, backend=backend,
                             batch_size=x.shape[0])
    )
    outs = model({graph.input_names[0]: x})
    return {k: np.asarray(v) for k, v in outs["__dumps__"].items()}


@pytest.mark.parametrize("model_name,kwargs,tol_growth", [
    ("espcn", {"h": 24, "w": 32}, 1),
    ("resnet18", {}, 3),
    ("mobilenetv2", {"h": 32, "w": 32, "num_classes": 10}, 3),
    ("unet", {"h": 32, "w": 32, "base_filters": 8, "depth": 2}, 2),
    ("styletransfer", {"h": 32, "w": 32, "num_res_blocks": 1}, 2),
    ("spatialdenoise", {"h": 24, "w": 32, "features": 8, "depth": 3}, 1),
])
def test_every_layer_matches_oracle(rng, model_name, kwargs, tol_growth):
    g = build_model(model_name, **kwargs)
    g.infer_shapes()
    x = rng.random((1, *g.nodes[g.input_names[0]].out_spec.shape[1:]),
                   dtype=np.float32)

    dumps = _layer_dumps(g, x)
    ref = oracle.oracle_execute(g, {g.input_names[0]: x})

    for name, got in dumps.items():
        want = ref[name]
        # deep nets accumulate fp error; allow growth over the base 0.01
        oracle.compare(got, want, 0.01 * tol_growth, f"{model_name}/{name}")


def test_espcn_layers_pallas_backend(rng):
    """Same validation through the pallas kernels (dump mode disables
    chain fusion, exercising the per-conv haloed path)."""
    g = build_model("espcn", h=24, w=32)
    g.infer_shapes()
    x = rng.random((1, 24, 32, 1), dtype=np.float32)
    dumps = _layer_dumps(g, x, backend=BackendKind.PALLAS)
    ref = oracle.oracle_execute(g, {g.input_names[0]: x})
    for name, got in dumps.items():
        oracle.compare(got, ref[name], 0.01, f"pallas/{name}")
