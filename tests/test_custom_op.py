"""Custom-operator extension test (the reference's Custom-Layer mechanism,
docs/Developer-Guide/Custom-Layer.md: user-registered layers usable from
the converter and engine)."""

import numpy as np

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph.ir import Graph, Node
from shadernn_tpu.ops.registry import OpDef, get_op, register


def test_register_and_run_custom_op(rng, fp32_threshold):
    @register("TestSwish2")
    class Swish2(OpDef):
        def infer(self, node, in_specs):
            return in_specs[0]

        def run(self, node, xs, ctx):
            import jax

            k = float(node.attr("k", 2.0))
            return xs[0] * jax.nn.sigmoid(k * xs[0])

    assert get_op("TestSwish2") is not None

    g = Graph()
    g.add(Node("in", "InputLayer", [], {"height": 6, "width": 8, "channels": 3}))
    g.add(Node("sw", "TestSwish2", ["in"], {"k": 3.0}))
    g.finalize()
    g.infer_shapes()

    x = rng.standard_normal((1, 6, 8, 3)).astype(np.float32)
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    want = x / (1 + np.exp(-3.0 * x))
    oracle.compare(got, want, fp32_threshold, "custom-op")


def test_custom_op_artifact_roundtrip(tmp_path, rng):
    """Custom ops flow through the JSON artifact (type string vocabulary)."""
    import json

    from shadernn_tpu.graph.parser import parse_model_dict

    model = {
        "numLayers": {"count": 2},
        "Layer_0": {"name": "in", "type": "InputLayer", "numInputs": 0,
                    "inputId": [], "Input Width": 8, "Input Height": 6,
                    "outputPlanes": 3},
        "Layer_1": {"name": "u", "type": "Unary", "numInputs": 1,
                    "inputId": [0], "op_type": "square"},
    }
    g = parse_model_dict(model)
    g.infer_shapes()
    x = rng.standard_normal((1, 6, 8, 3)).astype(np.float32)
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    np.testing.assert_allclose(got, x * x, atol=1e-6)
