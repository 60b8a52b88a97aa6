"""Runner configs + demo CLI tests (the reference's per-model run* surface)."""

import numpy as np
import pytest

from shadernn_tpu.config import BackendKind, Precision
from shadernn_tpu.models.runners import RUNNERS, make_engine, run_model


def test_runner_registry_covers_zoo():
    assert set(RUNNERS) >= {
        "espcn", "resnet18", "mobilenetv2", "styletransfer", "unet",
        "yolov3-tiny", "spatialdenoise", "aidenoise",
        "styletransfer-candy", "styletransfer-mosaic",
        "styletransfer-pointilism", "styletransfer-rain-princess",
        "styletransfer-udnie",
    }
    # Every runner's model must exist in the zoo (runner geometry is the
    # reference's; modelInference.cpp:32-124).
    from shadernn_tpu.models import list_models

    assert {cfg.model for cfg in RUNNERS.values()} <= set(list_models())


def test_aidenoise_runner_small():
    """runAIDenoiser analog (modelInference.cpp:77-104): luma in, residual
    denoised luma out at the same resolution."""
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models import build_model
    from shadernn_tpu.config import EngineOptions

    g = build_model("aidenoise", h=32, w=64)
    eng = Engine.from_graph(g, EngineOptions(precision=Precision.FP32))
    x = np.random.default_rng(7767517).random((1, 32, 64, 1), np.float32)
    y = np.asarray(eng.run_single(x))
    assert y.shape == (1, 32, 64, 1)
    assert np.isfinite(y).all()


def test_run_model_classification_small():
    result = run_model(
        "resnet18", precision=Precision.FP32, backend=BackendKind.XLA,
        inner_loops=3,
    )
    assert result["output_shape"] == (1, 10)
    assert result["class_index"].shape == (1,)
    assert result["stats"]["mean_ms"] > 0


def test_run_model_with_image(tmp_path, rng):
    from shadernn_tpu.image.color import ColorFormat
    from shadernn_tpu.image.image import Image

    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    p = tmp_path / "in.png"
    Image(img, ColorFormat.RGB8).save(str(p))
    result = run_model(
        "resnet18", image_path=str(p), precision=Precision.FP32,
        backend=BackendKind.XLA, inner_loops=2,
    )
    assert result["output_shape"] == (1, 10)


def test_auto_backend_resolution(monkeypatch):
    from shadernn_tpu.config import EngineOptions
    from shadernn_tpu.engine.compile import resolve_backend
    from shadernn_tpu.models import build_model

    # off-TPU, AUTO means XLA unless the interpret path is requested
    monkeypatch.setenv("SNN_AUTO_PALLAS_ANYWHERE", "1")
    g = build_model("espcn", h=16, w=24)
    g.infer_shapes()
    opts = EngineOptions(backend=BackendKind.AUTO)
    convs = [n for n in g.nodes.values() if n.op == "Conv2D"]
    # small-channel ESPCN convs pick the pallas kernel under AUTO
    assert all(
        resolve_backend(n, g, opts) == BackendKind.PALLAS for n in convs
    )
    g2 = build_model("mobilenetv2", h=32, w=32, num_classes=10)
    g2.infer_shapes()
    wide = [n for n in g2.nodes.values()
            if n.op == "Conv2D" and int(n.attr("out_channels")) > 32]
    assert all(resolve_backend(n, g2, opts) == BackendKind.XLA for n in wide)


def test_auto_backend_numerics(rng, fp32_threshold, monkeypatch):
    """AUTO must match XLA numerics end-to-end."""
    import oracle

    monkeypatch.setenv("SNN_AUTO_PALLAS_ANYWHERE", "1")
    from shadernn_tpu.config import EngineOptions
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    x = rng.random((1, 16, 24, 1), dtype=np.float32)
    want = np.asarray(
        compile_graph(build_model("espcn", h=16, w=24),
                      EngineOptions(backend=BackendKind.XLA)).run_single(x)
    )
    got = np.asarray(
        compile_graph(build_model("espcn", h=16, w=24),
                      EngineOptions(backend=BackendKind.AUTO)).run_single(x)
    )
    oracle.compare(got, want, fp32_threshold, "auto-backend")


def test_demo_cli_list(capsys):
    from shadernn_tpu.demo import main

    main(["list"])
    out = capsys.readouterr().out
    assert "espcn" in out and "540x960x1" in out


def test_demo_cli_run(capsys):
    from shadernn_tpu.demo import main

    main(["run", "resnet18", "--inner-loops", "2", "--precision", "fp32",
          "--backend", "xla"])
    out = capsys.readouterr().out
    assert "class_index" in out and "latency" in out
