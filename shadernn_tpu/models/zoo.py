"""Model zoo registry.

The analog of the reference's modelzoo/ directory + per-model runners
(demo/common/modelInference.h:32-124). Each entry is a builder producing a
Graph with either loaded or seeded-random weights; real zoo weights load
through graph/parser.py from ShaderNN-format artifacts.
"""

from __future__ import annotations

from typing import Callable, Dict

from shadernn_tpu.graph.ir import Graph

_BUILDERS: Dict[str, Callable[..., Graph]] = {}


def register_model(name: str):
    def deco(fn):
        _BUILDERS[name] = fn
        return fn

    return deco


def build_model(name: str, **kwargs) -> Graph:
    _ensure_loaded()
    if name not in _BUILDERS:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_BUILDERS)}")
    return _BUILDERS[name](**kwargs)


def list_models():
    _ensure_loaded()
    return sorted(_BUILDERS)


def _ensure_loaded():
    if _BUILDERS:
        return
    import functools

    from shadernn_tpu.models import (
        aidenoise, espcn, mobilenetv2, resnet18, spatialdenoise,
        styletransfer, unet, yolov3_tiny,
    )

    _BUILDERS.update(
        {
            "espcn": espcn.build_espcn,
            "mobilenetv2": mobilenetv2.build_mobilenetv2,
            "resnet18": resnet18.build_resnet18_cifar10,
            "unet": unet.build_unet,
            "styletransfer": styletransfer.build_style_transfer,
            "yolov3-tiny": yolov3_tiny.build_yolov3_tiny,
            "spatialdenoise": spatialdenoise.build_spatial_denoise,
            "aidenoise": aidenoise.build_aidenoise,
        }
    )
    # The reference zoo's five fast-neural-style variants
    # (modelzoo/StyleTransfer/{candy,mosaic,pointilism,rain-princess,
    # udnie}-9_simplified.json): one architecture, per-style weights.
    # Distinct seeds stand in for the per-style weights until a real
    # artifact is loaded via the parser.
    for i, _style in enumerate(
        ("candy", "mosaic", "pointilism", "rain-princess", "udnie")
    ):
        _BUILDERS[f"styletransfer-{_style}"] = functools.partial(
            styletransfer.build_style_transfer, style=_style, seed=7767517 + i
        )
