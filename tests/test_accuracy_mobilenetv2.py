"""Real-weight accuracy gates for the trained MobileNetV2 classifier.

The reference ships trained MobileNetV2 weights
(modelzoo/MobileNetV2/mobilenetv2_ft.json); this gate loads the in-repo
trained artifact (models/artifacts/mobilenetv2_cls10_trained*,
tools/train_mobilenetv2.py) and checks TRUE top-1 on held-out data —
precision-agreement on seeded weights cannot catch a semantic bug that
distorts both precisions identically; a real accuracy number can. Plus
the BASELINE.md precision-delta discipline (bf16 / int8 weight-only /
A8W8) on the same real weights.
"""

import os

import numpy as np
import pytest

import shadernn_tpu as snn
from shadernn_tpu.tools.train_resnet18 import synth_cls

ART = os.path.join(
    os.path.dirname(__file__), "..", "shadernn_tpu", "models", "artifacts"
)
JSON = os.path.join(ART, "mobilenetv2_cls10_trained_layers.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(JSON), reason="trained artifact not built"
)

BATCH = 64


def _eval_xy(n=256, seed=424242):
    rng = np.random.default_rng(seed)
    return synth_cls(rng, n)


def _top1(eng, x, y):
    correct = 0
    for i in range(0, len(x), BATCH):
        pred = np.asarray(eng.model.run_single(x[i : i + BATCH]))
        correct += int((pred.argmax(-1) == y[i : i + BATCH]).sum())
    return correct / len(x)


def _engine(precision=snn.Precision.FP32):
    return snn.Engine.from_json(
        JSON, snn.EngineOptions(precision=precision, batch_size=BATCH)
    )


def test_trained_mobilenetv2_top1():
    x, y = _eval_xy()
    acc = _top1(_engine(), x, y)
    assert acc >= 0.9, acc


def test_trained_mobilenetv2_precision_deltas():
    """bf16 and int8-weight top-1 within the reference delta discipline
    — depthwise/relu6/inverted-residual numerics on REAL weights."""
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.quant.quantize import quantize_graph_weights

    x, y = _eval_xy(n=128)
    acc32 = _top1(_engine(), x, y)

    eng16 = snn.Engine.from_json(
        JSON, snn.EngineOptions(precision=snn.Precision.BF16, batch_size=BATCH)
    )
    acc16 = _top1(eng16, x, y)

    g = snn.Engine.from_json(
        JSON, snn.EngineOptions(precision=snn.Precision.INT8, batch_size=BATCH)
    )
    quantize_graph_weights(g.model.graph)
    eng8 = Engine.from_graph(
        g.model.graph,
        snn.EngineOptions(precision=snn.Precision.INT8, batch_size=BATCH),
    )
    acc8 = _top1(eng8, x, y)

    assert acc16 >= acc32 - 0.03, (acc32, acc16)
    assert acc8 >= acc32 - 0.05, (acc32, acc8)


def test_trained_mobilenetv2_a8w8_top1():
    """Calibrated A8W8 (cost-gated: only MXU-profitable convs run int8
    activations — ops/conv.py a8w8_profitable) holds real top-1 within
    the weight-only budget on the trained model."""
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.quant.calibrate import calibrate_activations
    from shadernn_tpu.quant.quantize import quantize_graph_weights

    x, y = _eval_xy(n=128)
    acc32 = _top1(_engine(), x, y)

    g = snn.Engine.from_json(
        JSON, snn.EngineOptions(precision=snn.Precision.INT8, batch_size=BATCH)
    )
    quantize_graph_weights(g.model.graph)
    eng = Engine.from_graph(
        g.model.graph,
        snn.EngineOptions(precision=snn.Precision.INT8, batch_size=BATCH),
    )
    cal_x, _ = synth_cls(np.random.default_rng(7), BATCH)
    calibrate_activations(eng, [{"input": cal_x}], percentile=None)
    eng8 = Engine.from_graph(
        eng.model.graph,
        snn.EngineOptions(precision=snn.Precision.INT8, batch_size=BATCH),
    )
    acc8 = _top1(eng8, x, y)
    assert acc8 >= acc32 - 0.05, (acc32, acc8)
