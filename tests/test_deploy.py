"""Deployment artifact + raw-uint8 streaming tests."""

import numpy as np

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.deploy import ExportedEngine, export_engine
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.engine.streaming import StreamingEngine
from shadernn_tpu.models import build_model


def test_export_and_reload(tmp_path, rng, fp32_threshold):
    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions())
    x = rng.random((1, 16, 24, 1), dtype=np.float32)
    want = np.asarray(eng.run_single(x))

    path = export_engine(eng, str(tmp_path / "exported"))
    assert (tmp_path / "exported" / "step.stablehlo").exists()
    assert (tmp_path / "exported" / "params.npz").exists()

    loaded = ExportedEngine(path)
    got = np.asarray(loaded.run_single(x))
    oracle.compare(got, want, 1e-6, "exported-engine")
    assert loaded.meta["outputs"] == g.output_names


def test_export_classifier(tmp_path, rng):
    g = build_model("resnet18")
    eng = Engine.from_graph(g, EngineOptions(batch_size=2))
    path = export_engine(eng, str(tmp_path / "rn"))
    loaded = ExportedEngine(path)
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    want = np.asarray(eng.run_single(x))
    got = np.asarray(loaded.run_single(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_streaming_raw_uint8_ingest(rng):
    """Producers submit raw camera-style uint8 frames; ingest is fused
    into the inference step (the end-to-end zero-copy path)."""
    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions(batch_size=2))
    svc = StreamingEngine(
        eng, ingest={"means": (0.0,), "norms": (1 / 255.0,)}
    ).start()
    frames = [(rng.random((16, 24, 1)) * 255).astype(np.uint8) for _ in range(6)]
    for i, f in enumerate(frames):
        svc.submit(0, i, f)
    svc.stop(drain=True)

    got = {}
    while not svc.results.empty():
        r = svc.results.get()
        got[r.frame_id] = r.outputs[g.output_names[0]]
    assert len(got) == 6
    # match the non-streamed float path
    want = np.asarray(
        eng.run_single(
            np.repeat(frames[0][None].astype(np.float32) / 255.0, 2, axis=0)
        )
    )[0]
    np.testing.assert_allclose(got[0], want, atol=1e-4)
