"""Activation calibration + profiler trace capture tests."""

import os

import numpy as np

from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.models import build_model
from shadernn_tpu.quant.calibrate import (
    calibrate_activations,
    quantization_snr_db,
    quantize_activation,
)


def test_calibration_records_scales(rng):
    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions())
    batches = [{"input": rng.random((1, 16, 24, 1), dtype=np.float32)}
               for _ in range(3)]
    scales = calibrate_activations(eng, batches)
    # inputs are calibrated too: they are the first conv's A8 operand
    assert set(scales) == set(g.nodes)
    assert all(s > 0 for s in scales.values())
    assert g.meta["act_scales"] == scales
    # tanh output scale bounded by 1/127-ish
    assert scales[g.output_names[0]] <= 1.0 / 127 * 1.05


def test_quantize_activation_roundtrip(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32)
    scale = float(np.abs(x).max() / 127)
    q = quantize_activation(x, scale)
    assert q.dtype == np.int8
    err = np.abs(q.astype(np.float32) * scale - x).max()
    assert err <= scale * 0.51
    assert quantization_snr_db(x, scale) > 30


def test_capture_trace(tmp_path, rng):
    from shadernn_tpu.utils.profiler import capture_trace

    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions())
    out = capture_trace(
        eng, {"input": rng.random((1, 16, 24, 1), dtype=np.float32)},
        str(tmp_path / "trace"), steps=2,
    )
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
    found = []
    for root, _dirs, files in os.walk(out):
        found.extend(files)
    assert found, "no trace files written"
