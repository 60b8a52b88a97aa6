"""Metric utilities + spatial denoise model + precision-delta gates."""

import numpy as np
import pytest

from shadernn_tpu.config import EngineOptions, Precision
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.models import build_model
from shadernn_tpu.utils.metrics import (
    agreement_rate,
    average_precision,
    mean_average_precision,
    psnr,
    top1_accuracy,
    topk_accuracy,
)


def test_top1_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = np.array([1, 0, 0])
    assert top1_accuracy(logits, labels) == pytest.approx(2 / 3)
    # row 3's label 0 is not in its top-2 {2, 1}
    assert topk_accuracy(logits, labels, k=2) == pytest.approx(2 / 3)
    assert topk_accuracy(logits, labels, k=3) == pytest.approx(1.0)


def test_psnr():
    a = np.zeros((8, 8))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert psnr(a, b) == pytest.approx(20.0, abs=0.01)


def test_average_precision_perfect_and_miss():
    gt = np.array([[0.0, 0.0, 1.0, 1.0]])
    pred_hit = np.array([[0.9, 0.05, 0.0, 1.0, 1.0]])
    pred_miss = np.array([[0.9, 5.0, 5.0, 1.0, 1.0]])
    assert average_precision(pred_hit, gt) == pytest.approx(1.0)
    assert average_precision(pred_miss, gt) == 0.0


def test_map_format_matches_yolo_output():
    dets = [np.array([[0, 0.9, 0.1, 0.1, 0.3, 0.3],
                      [1, 0.8, 0.5, 0.5, 0.2, 0.2]])]
    gts = [np.array([[0, 0.1, 0.1, 0.3, 0.3],
                     [1, 0.5, 0.5, 0.2, 0.2]])]
    assert mean_average_precision(dets, gts, num_classes=2) == pytest.approx(1.0)


def test_spatialdenoise_model(rng):
    g = build_model("spatialdenoise", h=64, w=96, merge_source=True)
    from shadernn_tpu.engine.compile import compile_graph

    model = compile_graph(g, EngineOptions())
    y = rng.random((1, 64, 96, 1), dtype=np.float32)
    src = rng.random((1, 64, 96, 4), dtype=np.float32)
    outs = model({"input": y, "source": src})
    merged = np.asarray(outs["merge"])
    assert merged.shape == (1, 64, 96, 4)
    # chroma channels pass through from the source (Calculate merge_y_uv)
    np.testing.assert_allclose(merged[..., 1:], src[..., 1:], atol=1e-6)


def test_precision_delta_gate_espcn(rng):
    """bf16 and int8 must stay within the reference FP16 tolerance (0.1)
    and hold a sane PSNR vs fp32 — the BASELINE.md accuracy gate."""
    from shadernn_tpu.utils.metrics import precision_delta_report

    def make(p):
        return Engine.from_graph(
            build_model("espcn", h=32, w=48), EngineOptions(precision=p)
        )

    x = rng.random((1, 32, 48, 1), dtype=np.float32)
    for low in (Precision.BF16, Precision.INT8):
        rep = precision_delta_report(
            make(Precision.FP32), make(low), {"input": x}, kind="sr"
        )
        assert rep["max_abs_diff"] <= 0.1, (low, rep)
        assert rep["psnr_db"] >= 30.0, (low, rep)


def test_precision_delta_gate_classifier(rng):
    from shadernn_tpu.utils.metrics import precision_delta_report

    def make(p):
        return Engine.from_graph(
            build_model("resnet18"), EngineOptions(precision=p, batch_size=4)
        )

    x = rng.random((4, 32, 32, 3), dtype=np.float32)
    rep = precision_delta_report(
        make(Precision.FP32), make(Precision.INT8), {"input": x},
        kind="classification",
    )
    assert rep["top1_agreement"] == 1.0, rep
