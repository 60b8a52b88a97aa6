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
    # candy/mosaic load REAL per-style weights trained at 512^2
    # (tools/train_styletransfer.py, gated in
    # tests/test_accuracy_styletransfer.py); the remaining styles keep
    # distinct seeds until their artifacts are trained.
    import os as _os

    _art = _os.path.join(_os.path.dirname(__file__), "artifacts")

    def _style_builder(style: str, seed: int):
        art_path = _os.path.join(
            _art, f"styletransfer_{style}512_trained_layers.json"
        )

        def build(h: int = 224, w: int = 224, **kw):
            if _os.path.exists(art_path):
                from shadernn_tpu.graph.parser import parse_model_file

                # fully convolutional: input_hw retargets the 512 artifact
                # to the requested frame size (trained & gated at 512)
                return parse_model_file(art_path, input_hw=(h, w))
            return styletransfer.build_style_transfer(
                h=h, w=w, style=style, seed=seed, **kw
            )

        return build

    for i, _style in enumerate(
        ("candy", "mosaic", "pointilism", "rain-princess", "udnie")
    ):
        _BUILDERS[f"styletransfer-{_style}"] = _style_builder(
            _style, 7767517 + i
        )
