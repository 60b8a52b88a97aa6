"""Spatial denoiser, reference zoo model modelzoo/SpatialDenoise/
spatialDenoise.json (runner config: 1080x1920 Y-channel input,
demo/common/modelInference.cpp:61-74; the Calculate op recombines the
denoised luma with the original chroma, calculationGL.cpp:28-57).

Residual denoise CNN on Y + Calculate merge with the source frame.
"""

from __future__ import annotations

from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.graph.ir import Graph, Node


def build_spatial_denoise(
    h: int = 1080, w: int = 1920, features: int = 16, depth: int = 4,
    merge_source: bool = False, seed: int = 7767517,
) -> Graph:
    """merge_source=True adds the reference's Y+UV recombination: a second
    RGBA input whose chroma is merged with the denoised luma."""
    b = GraphBuilder("spatialDenoise", seed=seed)
    y = b.input(h, w, 1, name="input")
    x = b.conv2d(y, features, 3, activation="relu", name="enc")
    for i in range(depth - 2):
        x = b.conv2d(x, features, 3, activation="relu", name=f"mid{i}")
    x = b.conv2d(x, 1, 3, name="residual")
    out = b.add([y, x], name="denoised_y")
    if merge_source:
        src = b.input(h, w, 4, name="source", index=1)
        b._add(Node("merge", "Calculate", [out, src], {"expr": "merge_y_uv"}))
    return b.build()
