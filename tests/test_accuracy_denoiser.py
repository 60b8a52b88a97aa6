"""Real-weight accuracy gates for the trained SpatialDenoise artifact
(models/artifacts/spatialdenoise_trained*, tools/train_denoiser.py).

Reference analog: the zoo's trained SpatialDenoise model + the engine's
end-to-end image-quality validation (demo/test_espcn.sh pattern). A
trained denoiser must beat the identity baseline by several dB — random
weights cannot; precision deltas follow BASELINE.md discipline.
"""

import os

import numpy as np
import pytest

import shadernn_tpu as snn
from shadernn_tpu.tools.train_denoiser import noisy_pairs
from shadernn_tpu.tools.train_espcn import psnr

ART = os.path.join(
    os.path.dirname(__file__), "..", "shadernn_tpu", "models", "artifacts"
)
JSON = os.path.join(ART, "spatialdenoise_trained_layers.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(JSON), reason="trained artifact not built"
)


def _eval_set(n=8, size=96, seed=20260820):
    return noisy_pairs(np.random.default_rng(seed), n, size)


def _psnr_at(precision, x, y, hw):
    eng = snn.Engine.from_json(
        JSON,
        snn.EngineOptions(precision=precision, batch_size=len(x)),
        input_hw=hw,
    )
    if precision == snn.Precision.INT8:
        from shadernn_tpu.quant.quantize import quantize_graph_weights

        from shadernn_tpu.engine.engine import Engine

        g = eng.model.graph
        quantize_graph_weights(g)
        eng = Engine.from_graph(
            g, snn.EngineOptions(precision=precision, batch_size=len(x))
        )
    pred = np.asarray(eng.model.run_single(x), np.float32)
    return psnr(pred, y)


def test_trained_denoiser_beats_identity():
    x, y = _eval_set()
    p_model = _psnr_at(snn.Precision.FP32, x, y, (96, 96))
    p_noisy = psnr(x, y)
    assert p_model > p_noisy + 3.0, (p_model, p_noisy)
    assert p_model > 26.0, p_model


def test_trained_denoiser_precision_deltas():
    x, y = _eval_set()
    p32 = _psnr_at(snn.Precision.FP32, x, y, (96, 96))
    p16 = _psnr_at(snn.Precision.BF16, x, y, (96, 96))
    p8 = _psnr_at(snn.Precision.INT8, x, y, (96, 96))
    assert p16 > p32 - 1.0, (p32, p16)
    assert p8 > p32 - 1.5, (p32, p8)
