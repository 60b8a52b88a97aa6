"""AI pre-denoiser, the reference's runAIDenoiser model
(demo/common/modelInference.cpp:77-104: "AIDenoise/eff_predenoise_20200330
.json", 1080x1920 single-channel input, 1/255 normalization, OTHER type).

The reference repository does NOT ship the AIDenoise artifact (it is absent
from modelzoo/), so this builder provides a seeded efficient pre-denoise
architecture with the runner's exact I/O contract; real weights load
through graph/parser.py when an artifact is supplied (runner model_path).

Design (efficient at 1080x1920): stride-2 conv encoder so the core convs
run at quarter resolution, subpixel (depth_to_space) decoder back to full
resolution, global residual add — the standard fast-denoise layout.
"""

from __future__ import annotations

from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.graph.ir import Graph


def build_aidenoise(
    h: int = 1080, w: int = 1920, channels: int = 1, features: int = 16,
    depth: int = 3, seed: int = 7767517,
) -> Graph:
    assert channels == 1, "AIDenoise runs on the luma plane (1 channel)"
    import os

    art = os.path.join(
        os.path.dirname(__file__), "artifacts", "aidenoise_trained_layers.json"
    )
    if os.path.exists(art) and (features, depth) == (16, 3):
        # in-repo TRAINED artifact (tools/train_denoiser.py --model
        # aidenoise; the reference ships none): fully convolutional, so
        # input_hw retargets it to the requested frame size. Gates in
        # tests/test_accuracy_denoiser.py.
        from shadernn_tpu.graph.parser import parse_model_file

        return parse_model_file(art, input_hw=(h, w))
    b = GraphBuilder("eff_predenoise", seed=seed)
    y = b.input(h, w, 1, name="input")
    x = b.conv2d(y, features, 3, stride=2, activation="relu", name="down")
    for i in range(depth):
        x = b.conv2d(x, features, 3, activation="relu", name=f"core{i}")
    x = b.conv2d(x, 4, 3, name="expand")  # 4 = 2x2 subpixel to 1 channel
    x = b.subpixel(x, scale=2, name="up")
    b.add([y, x], name="denoised")
    return b.build()
