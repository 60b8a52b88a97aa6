"""Real-weight accuracy gates for the trained denoiser artifacts:
SpatialDenoise and U-Net (models/artifacts/{spatialdenoise,unet}_trained*,
tools/train_denoiser.py).

Reference analog: the zoo's trained SpatialDenoise / U-Net models + the
engine's end-to-end image-quality validation (demo/test_espcn.sh
pattern). A trained denoiser must beat the identity baseline by several
dB — random weights cannot; precision deltas follow BASELINE.md
discipline.
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
ARTIFACTS = {
    "spatialdenoise": os.path.join(ART, "spatialdenoise_trained_layers.json"),
    "unet": os.path.join(ART, "unet_trained_layers.json"),
    # the reference ships NO AIDenoise artifact (its runner points at an
    # absent zoo file); this one is trained in-repo anyway — the eighth
    # and last zoo family to carry real gated weights
    "aidenoise": os.path.join(ART, "aidenoise_trained_layers.json"),
}
# eval size must respect unet's pooling depth (divisible by 2^3)
SIZE = 96

params = [
    pytest.param(name, path, marks=pytest.mark.skipif(
        not os.path.exists(path), reason=f"{name} artifact not built"))
    for name, path in ARTIFACTS.items()
]


def _eval_set(n=8, size=SIZE, seed=20260820):
    return noisy_pairs(np.random.default_rng(seed), n, size)


def _psnr_at(path, precision, x, y):
    eng = snn.Engine.from_json(
        path,
        snn.EngineOptions(precision=precision, batch_size=len(x)),
        input_hw=(SIZE, SIZE),
    )
    if precision == snn.Precision.INT8:
        from shadernn_tpu.engine.engine import Engine
        from shadernn_tpu.quant.quantize import quantize_graph_weights

        g = eng.model.graph
        quantize_graph_weights(g)
        eng = Engine.from_graph(
            g, snn.EngineOptions(precision=precision, batch_size=len(x))
        )
    pred = np.asarray(eng.model.run_single(x), np.float32)
    return psnr(pred, y)


@pytest.mark.parametrize("name,path", params)
def test_trained_denoiser_beats_identity(name, path):
    x, y = _eval_set()
    p_model = _psnr_at(path, snn.Precision.FP32, x, y)
    p_noisy = psnr(x, y)
    assert p_model > p_noisy + 3.0, (name, p_model, p_noisy)
    assert p_model > 26.0, (name, p_model)


@pytest.mark.parametrize("name,path", params)
def test_trained_denoiser_precision_deltas(name, path):
    x, y = _eval_set()
    p32 = _psnr_at(path, snn.Precision.FP32, x, y)
    p16 = _psnr_at(path, snn.Precision.BF16, x, y)
    p8 = _psnr_at(path, snn.Precision.INT8, x, y)
    assert p16 > p32 - 1.0, (name, p32, p16)
    assert p8 > p32 - 1.5, (name, p32, p8)
