"""Model-family smoke tests: build, compile, run, and check output shapes.

Covers the reference's model zoo (SURVEY.md T3): ESPCN, MobileNetV2,
ResNet18, U-Net, StyleTransfer, YOLOv3-tiny. Small spatial sizes keep CPU
CI fast; full-size runs happen in bench.py.
"""

import numpy as np
import pytest

from shadernn_tpu.config import EngineOptions, Precision
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.models import build_model, list_models


def _run(graph, batch=1):
    model = compile_graph(graph, EngineOptions(batch_size=batch))
    x = np.random.default_rng(0).random(
        (batch, *graph.nodes[graph.input_names[0]].out_spec.shape[1:]),
        dtype=np.float32,
    )
    return np.asarray(model.run_single(x))


def test_zoo_lists_all_families():
    assert set(list_models()) >= {
        "espcn", "mobilenetv2", "resnet18", "unet", "styletransfer", "yolov3-tiny"
    }


def test_espcn():
    g = build_model("espcn", h=32, w=48)
    y = _run(g)
    assert y.shape == (1, 64, 96, 1)
    assert np.all(np.abs(y) <= 1.0)  # tanh output


def test_resnet18():
    g = build_model("resnet18")
    y = _run(g)
    assert y.shape == (1, 10)
    np.testing.assert_allclose(y.sum(), 1.0, rtol=1e-3)  # softmax


def test_mobilenetv2():
    g = build_model("mobilenetv2", h=96, w=96, num_classes=100)
    y = _run(g)
    assert y.shape == (1, 100)
    np.testing.assert_allclose(y.sum(), 1.0, rtol=1e-3)


def test_unet():
    g = build_model("unet", h=64, w=64, base_filters=8, depth=3)
    y = _run(g)
    assert y.shape == (1, 64, 64, 1)
    assert np.all((y >= 0) & (y <= 1))  # sigmoid


def test_styletransfer():
    g = build_model("styletransfer", h=64, w=64, num_res_blocks=2)
    y = _run(g)
    assert y.shape == (1, 64, 64, 3)


def test_yolov3_tiny():
    g = build_model("yolov3-tiny", h=128, w=128, max_detections=20)
    y = _run(g)
    assert y.shape == (1, 20, 6)
    # padded rows have score 0; scores sorted descending
    scores = y[0, :, 1]
    assert np.all(np.diff(scores) <= 1e-6)


@pytest.mark.parametrize("precision", [Precision.BF16, Precision.INT8])
def test_espcn_low_precision(precision):
    from shadernn_tpu.engine.engine import Engine

    g = build_model("espcn", h=32, w=48)
    eng = Engine.from_graph(g, EngineOptions(precision=precision))
    x = np.random.default_rng(0).random((1, 32, 48, 1), dtype=np.float32)
    y = np.asarray(eng.run_single(x))
    assert y.shape == (1, 64, 96, 1)


def test_engine_rejects_wrong_input_shape():
    """Fixed-shape engine: wrong (H, W, C) raises instead of silently
    retracing; a wrong input name raises KeyError."""
    from shadernn_tpu.engine.engine import Engine

    g = build_model("espcn", h=32, w=48)
    eng = Engine.from_graph(g, EngineOptions())
    with pytest.raises(ValueError, match="compiled for"):
        eng.run({"input": np.zeros((1, 48, 32, 1), np.float32)})
    with pytest.raises(ValueError, match="compiled for"):
        eng.run({"input": np.zeros((1, 32, 48), np.float32)})
    with pytest.raises(KeyError, match="missing input"):
        eng.run({"frames": np.zeros((1, 32, 48, 1), np.float32)})
    # different batch size is allowed (recompile, warned once)
    y = eng.run({"input": np.zeros((2, 32, 48, 1), np.float32)})
    assert np.asarray(y[g.output_names[0]]).shape == (2, 64, 96, 1)


def test_output_dtype_activation():
    """output_dtype="activation" hands back the compute dtype (the analog
    of the reference handing consumers fp16 textures instead of upcasting,
    imageTexture.h:31); values match the default f32 path exactly after
    casting. Skipping the upcast removes a full-size layout copy of the
    LARGEST tensor from the step (~500us on ESPCN 1080p)."""
    import jax.numpy as jnp

    from shadernn_tpu.engine.engine import Engine

    g = build_model("espcn", h=32, w=48)
    x = np.random.default_rng(0).random((1, 32, 48, 1), dtype=np.float32)
    y32 = np.asarray(
        Engine.from_graph(
            g, EngineOptions(precision=Precision.BF16)
        ).run_single(x)
    )
    eng = Engine.from_graph(
        g,
        EngineOptions(precision=Precision.BF16, output_dtype="activation"),
    )
    yact = eng.run_single(x)
    assert yact.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(yact).astype(np.float32), y32.astype(np.float32)
    )


def test_auto_output_layout_matches_default():
    """auto_output_layout lets XLA pick output buffer layouts (drops the
    final full-size layout copy, ~107us/step on ESPCN 1080p b8); values
    are identical to the default-layout engine."""
    from shadernn_tpu.engine.engine import Engine

    g1 = build_model("espcn", h=32, w=48)
    g2 = build_model("espcn", h=32, w=48)
    x = np.random.default_rng(1).random((2, 32, 48, 1), dtype=np.float32)
    base = np.asarray(
        Engine.from_graph(g1, EngineOptions(batch_size=2)).run_single(x)
    )
    auto = np.asarray(
        Engine.from_graph(
            g2, EngineOptions(batch_size=2, auto_output_layout=True)
        ).run_single(x)
    )
    np.testing.assert_array_equal(base, auto)
