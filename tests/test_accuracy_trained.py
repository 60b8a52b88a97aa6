"""Real-weight accuracy gates on the trained ESPCN artifact.

The reference gates ESPCN end-to-end against its Keras ground truth and an
image-quality threshold (demo/test_espcn.sh:45-57, testutil.h:1194-1195).
These tests do the same with the in-repo trained artifact
(models/artifacts/espcn_2x_trained*, produced by tools/train_espcn.py):

  1. the artifact loads through the public Engine.from_json path;
  2. super-resolution QUALITY: PSNR on held-out data beats the bilinear
     interpolation baseline (a trained prior, not seeded noise);
  3. engine output matches keras.predict on the same H5 (conversion
     correctness with real weights);
  4. precision deltas (bf16/int8 vs fp32) stay inside the BASELINE.md
     accuracy-delta discipline on real weights.
"""

import os

import numpy as np
import pytest

import shadernn_tpu as snn
from shadernn_tpu.tools.train_espcn import (
    bilinear_up2, downsample2, psnr, synth_hr,
)

ART = os.path.join(
    os.path.dirname(__file__), "..", "shadernn_tpu", "models", "artifacts"
)
JSON = os.path.join(ART, "espcn_2x_trained_layers.json")
H5 = os.path.join(ART, "espcn_2x_trained.h5")

pytestmark = pytest.mark.skipif(
    not os.path.exists(JSON), reason="trained artifact not built"
)


def _eval_set(n=4, size=128, seed=123):
    rng = np.random.default_rng(seed)
    hr = synth_hr(rng, n, size)
    return downsample2(hr), hr


def _engine(precision=snn.Precision.FP32, batch=4, hw=(64, 64)):
    # The artifact pins the 540p benchmark geometry; evaluation re-targets
    # it to the held-out patch size (weights are size-agnostic).
    return snn.Engine.from_json(
        JSON, snn.EngineOptions(precision=precision, batch_size=batch),
        input_hw=hw,
    )


def test_trained_espcn_beats_bilinear():
    lr, hr = _eval_set()
    eng = _engine()
    pred = np.asarray(eng.model.run_single(lr))
    c = 8
    p_model = psnr(pred[:, c:-c, c:-c], hr[:, c:-c, c:-c])
    p_base = psnr(bilinear_up2(lr)[:, c:-c, c:-c], hr[:, c:-c, c:-c])
    assert p_model > p_base + 0.8, (p_model, p_base)
    assert p_model > 30.0, p_model


def test_trained_espcn_matches_keras_predict():
    keras = pytest.importorskip("keras")
    lr, _ = _eval_set(n=2, size=64)
    from shadernn_tpu.tools.train_espcn import _depth_to_space_2x

    km = keras.models.load_model(
        H5, safe_mode=False, compile=False,
        custom_objects={"_depth_to_space_2x": _depth_to_space_2x},
    )
    want = np.asarray(km.predict(lr, verbose=0))
    eng = _engine(batch=2)
    got = np.asarray(eng.model.run_single(lr))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_trained_precision_deltas():
    from shadernn_tpu.utils.metrics import precision_delta_report

    lr, _ = _eval_set()
    fp32 = _engine(snn.Precision.FP32)
    bf16 = _engine(snn.Precision.BF16)
    int8 = _engine(snn.Precision.INT8)
    rep_bf16 = precision_delta_report(fp32, bf16, {"input": lr}, kind="sr")
    rep_int8 = precision_delta_report(fp32, int8, {"input": lr}, kind="sr")
    # bf16 keeps >35 dB agreement with fp32 on real weights; weight-only
    # int8 >30 dB (per-channel scales). Outputs are tanh-bounded [-1, 1].
    assert rep_bf16["psnr_db"] > 35.0, rep_bf16
    assert rep_int8["psnr_db"] > 30.0, rep_int8
