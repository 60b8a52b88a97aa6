"""Per-model runners: the reference's run{ESPCN,Resnet18,...} functions
(demo/common/modelInference.h:32-124, modelInference.cpp) as data-driven
configs + one `run_model` entry point. Each config carries the input
geometry and preprocessing (mean/norm, luma) the reference uses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from shadernn_tpu.config import BackendKind, EngineOptions, Precision
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.models import build_model
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.runners")


@dataclasses.dataclass(frozen=True)
class RunnerConfig:
    model: str
    height: int
    width: int
    channels: int
    model_type: str = "other"  # other | classification | detection
    means: Tuple[float, ...] = (0.0,)
    norms: Tuple[float, ...] = (1.0,)
    luma_only: bool = False
    build_kwargs: dict = dataclasses.field(default_factory=dict)


# Input geometries from the reference runners (modelInference.cpp):
# ESPCN 540p Y-channel; resnet18 cifar 32x32; styletransfer 224;
# U-Net 256; yolov3-tiny 416; spatial denoise 1080x1920 Y.
RUNNERS = {
    "espcn": RunnerConfig(
        "espcn", 540, 960, 1, means=(0.0,), norms=(1.0,), luma_only=True,
    ),
    "resnet18": RunnerConfig(
        "resnet18", 32, 32, 3, model_type="classification",
        means=(0.4914 * 255, 0.4822 * 255, 0.4465 * 255),
        norms=(1 / (0.2470 * 255), 1 / (0.2435 * 255), 1 / (0.2616 * 255)),
    ),
    "mobilenetv2": RunnerConfig(
        "mobilenetv2", 224, 224, 3, model_type="classification",
        means=(127.5, 127.5, 127.5), norms=(1 / 127.5,) * 3,
    ),
    "styletransfer": RunnerConfig(
        "styletransfer", 224, 224, 3, means=(0.0,), norms=(1.0,),
    ),
    "unet": RunnerConfig(
        "unet", 256, 256, 1, means=(0.0,), norms=(1 / 255.0,), luma_only=True,
    ),
    "yolov3-tiny": RunnerConfig(
        "yolov3-tiny", 416, 416, 3, model_type="detection",
        means=(0.0,), norms=(1 / 255.0,),
    ),
    "spatialdenoise": RunnerConfig(
        "spatialdenoise", 1080, 1920, 1, means=(0.0,), norms=(1 / 255.0,),
        luma_only=True,
    ),
    # runAIDenoiser (modelInference.cpp:77-104): 1080x1920 luma, 1/255.
    "aidenoise": RunnerConfig(
        "aidenoise", 1080, 1920, 1, means=(0.0,), norms=(1 / 255.0,),
        luma_only=True,
    ),
}

# The reference zoo's per-style fast-neural-style models share the
# styletransfer runner geometry (modelInference.cpp:212-225).
for _style in ("candy", "mosaic", "pointilism", "rain-princess", "udnie"):
    RUNNERS[f"styletransfer-{_style}"] = RunnerConfig(
        f"styletransfer-{_style}", 224, 224, 3, means=(0.0,), norms=(1.0,),
    )


def make_engine(
    name: str,
    precision: Precision = Precision.BF16,
    backend: BackendKind = BackendKind.AUTO,
    batch_size: int = 1,
    model_path: Optional[str] = None,
    mesh=None,
) -> Engine:
    cfg = RUNNERS[name]
    options = EngineOptions(precision=precision, backend=backend, batch_size=batch_size)
    if model_path:
        return Engine.from_json(model_path, options, mesh=mesh)
    graph = build_model(
        cfg.model, h=cfg.height, w=cfg.width, channels=cfg.channels,
        **cfg.build_kwargs,
    )
    return Engine.from_graph(graph, options, mesh=mesh)


def run_model(
    name: str,
    image_path: Optional[str] = None,
    precision: Precision = Precision.BF16,
    backend: BackendKind = BackendKind.AUTO,
    batch_size: int = 1,
    inner_loops: int = 10,
    dump_dir: Optional[str] = None,
) -> dict:
    """Load -> preprocess -> run -> postprocess, like the reference's
    processModel flow (modelInference.cpp:26-60). With no image, a seeded
    random frame is used (the unit-test RandomMat pattern)."""
    from shadernn_tpu.image.image import load_and_preprocess

    cfg = RUNNERS[name]
    eng = make_engine(name, precision, backend, batch_size)
    if image_path:
        x = load_and_preprocess(
            image_path, cfg.height, cfg.width, cfg.means, cfg.norms,
            luma_only=cfg.luma_only, batch=batch_size,
        )
    else:
        x = np.random.default_rng(7767517).random(
            (batch_size, cfg.height, cfg.width, cfg.channels), dtype=np.float32
        )
    stats = eng.benchmark({eng.graph.input_names[0]: x}, loops=inner_loops)
    out = eng.run_single(x)
    result = {"stats": stats, "output_shape": tuple(out.shape)}
    if cfg.model_type == "classification":
        result["class_index"] = np.asarray(np.argmax(np.asarray(out), axis=-1))
    elif cfg.model_type == "detection":
        dets = np.asarray(out)[0]
        result["detections"] = dets[dets[:, 1] > 0]
    if dump_dir:
        from shadernn_tpu.tools.dump_reader import dump_layers

        result["dumps"] = dump_layers(
            eng, {eng.graph.input_names[0]: x}, dump_dir
        )
    return result
