"""Image subsystem + continuous batching + profiler tests."""

import numpy as np
import pytest

from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.engine.streaming import StreamingEngine
from shadernn_tpu.image.color import ColorFormat, nv12_to_rgb, rgb_to_y
from shadernn_tpu.image.image import Image, load_and_preprocess
from shadernn_tpu.image.ingest import ingest_frames, nv12_to_rgb_device
from shadernn_tpu.models import build_model


def test_color_roundtrip(rng):
    rgb = (rng.random((8, 10, 3)) * 255).astype(np.uint8)
    img = Image(rgb, ColorFormat.RGB8)
    f = img.to_float()
    assert f.pixels.dtype == np.float32 and f.pixels.max() <= 1.0
    back = f.to_format(ColorFormat.RGB8)
    assert np.abs(back.pixels.astype(int) - rgb.astype(int)).max() <= 1


def test_luma_matches_reference_coefficients():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 255  # pure red
    y = Image(rgb, ColorFormat.RGB8).luma()
    np.testing.assert_allclose(y.pixels, 0.299, atol=1e-3)


def test_nv12_grey_roundtrip():
    h, w = 8, 8
    y_plane = np.full((h, w), 128, np.uint8)
    uv = np.full((h // 2, w // 2, 2), 128, np.uint8)  # neutral chroma
    data = np.concatenate([y_plane.reshape(-1), uv.reshape(-1)])
    rgb = nv12_to_rgb(data, h, w)
    # neutral chroma + mid luma -> grey
    assert np.abs(rgb.astype(int) - rgb[0, 0, 0].astype(int)).max() <= 1
    assert abs(int(rgb[0, 0, 0]) - 130) <= 3  # 1.164*(128-16) ~ 130


def test_device_ingest_matches_host(rng):
    frames = (rng.random((2, 12, 16, 3)) * 255).astype(np.uint8)
    means, norms = (127.5, 127.5, 127.5), (1 / 127.5, 1 / 127.5, 1 / 127.5)
    dev = np.asarray(
        ingest_frames(frames, means=means, norms=norms, dtype_name="float32")
    )
    host = (frames.astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_device_nv12(rng):
    h, w = 8, 12
    y_plane = (rng.random((1, h, w)) * 255).astype(np.uint8)
    uv = (rng.random((1, h // 2, w // 2, 2)) * 255).astype(np.uint8)
    dev = np.asarray(nv12_to_rgb_device(y_plane, uv))
    data = np.concatenate([y_plane[0].reshape(-1), uv[0].reshape(-1)])
    host = nv12_to_rgb(data, h, w)
    assert np.abs(dev[0] - host.astype(np.float32)).max() <= 1.5


def test_image_save_load_roundtrip(tmp_path, rng):
    rgb = (rng.random((6, 7, 3)) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    Image(rgb, ColorFormat.RGB8).save(str(p))
    back = Image.load(str(p))
    np.testing.assert_array_equal(back.pixels, rgb)


def test_load_and_preprocess(tmp_path, rng):
    rgb = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    p = tmp_path / "in.png"
    Image(rgb, ColorFormat.RGB8).save(str(p))
    batch = load_and_preprocess(str(p), 10, 15, luma_only=True, batch=2)
    assert batch.shape == (2, 10, 15, 1)
    assert 0.0 <= batch.min() and batch.max() <= 1.0


def test_streaming_continuous_batching(rng):
    """Multi-stream frames through the batcher match single-shot results."""
    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions(batch_size=4))
    frames = [rng.random((16, 24, 1), dtype=np.float32) for _ in range(10)]

    # ground truth one-by-one
    want = [np.asarray(eng.run_single(f[None]))[0] for f in frames]

    svc = StreamingEngine(eng).start()
    for i, f in enumerate(frames):
        svc.submit(stream_id=i % 3, frame_id=i, data=f)
    svc.stop(drain=True)

    got = {}
    while not svc.results.empty():
        r = svc.results.get()
        got[r.frame_id] = r.outputs[g.output_names[0]]
    assert len(got) == len(frames)
    for i in range(len(frames)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-4)
    stats = svc.stats()
    assert stats["frames_done"] == 10
    assert stats["batches_run"] <= 10  # batching actually happened


def test_streaming_dispatch_overlaps_fetch():
    """The dispatcher must run AHEAD of the output fetch (VERDICT r3 #5):
    batch N+1 dispatches while batch N is still executing. Uses a stub
    engine whose outputs stay not-ready for 30 ms (simulated device
    latency), and asserts later batches were dispatched before earlier
    batches drained — impossible in the old synchronous loop, which
    blocked on np.asarray before the next dispatch."""
    import time as _t

    from shadernn_tpu.engine.streaming import StreamingEngine

    dispatch_times = []
    drain_times = []

    class SlowResult:
        """Device-array stand-in: a serial device that takes 30 ms per
        batch, executing queued batches in dispatch order."""

        device_free = 0.0  # when the emulated device finishes queued work

        def __init__(self, x):
            self._x = x
            start = max(_t.monotonic(), SlowResult.device_free)
            self._ready_at = start + 0.03
            SlowResult.device_free = self._ready_at

        def is_ready(self):
            return _t.monotonic() >= self._ready_at

        def __array__(self, dtype=None, copy=None):
            # a blocking read waits out the remaining "execution" time
            rem = self._ready_at - _t.monotonic()
            if rem > 0:
                _t.sleep(rem)
            return np.asarray(self._x, dtype)

    class StubModel:
        def __call__(self, inputs):
            dispatch_times.append(_t.monotonic())
            return {"out": SlowResult(inputs["input"])}

    class StubEngine:
        class options:
            batch_size = 1
            auto_output_layout = False

        class graph:
            input_names = ["input"]

        model = StubModel()

    svc = StreamingEngine(
        StubEngine(), max_inflight=4,
        on_result=lambda r: drain_times.append(_t.monotonic()),
    ).start()
    for i in range(6):
        svc.submit(0, i, np.zeros((4, 4, 1), np.float32))
    svc.stop(drain=True)

    assert len(dispatch_times) == 6 and len(drain_times) == 6
    # batch 5 (0-based) must dispatch before batch 2's result was drained:
    # with max_inflight=4 the dispatcher may run up to 4 batches ahead.
    # The synchronous loop dispatches batch 5 only after batch 4 drained.
    assert dispatch_times[5] < drain_times[2], (
        f"dispatch ran {[round(t - dispatch_times[0], 3) for t in dispatch_times]}, "
        f"drain {[round(t - dispatch_times[0], 3) for t in drain_times]}"
    )
    assert svc.stats()["frames_done"] == 6


def test_streaming_prefilled_and_double_closed_queue():
    """Regression (r5): a window pattern that pre-fills the queue, closes
    it, starts the dispatcher, then stop(drain=True) closes it AGAIN used
    to hand the dispatcher a [None, None] batch and crash _run_batch on
    an empty frame list (aborting the window with deflated stats). Every
    frame must come back exactly once, for several inflight settings."""
    from shadernn_tpu.engine.streaming import StreamingEngine

    class StubModel:
        def __call__(self, inputs):
            return {"out": inputs["input"]}

    class StubEngine:
        class options:
            batch_size = 4
            auto_output_layout = False

        class graph:
            input_names = ["input"]

        model = StubModel()

    for inflight in (1, 2, 4):
        got = []
        svc = StreamingEngine(
            StubEngine(), max_inflight=inflight,
            on_result=lambda r: got.append(r.frame_id),
        )
        for i in range(10):  # 2 full batches + one partial
            svc.submit(0, i, np.full((2, 2, 1), i, np.float32))
        svc.queue.close()
        svc.start()
        svc.stop(drain=True)
        assert sorted(got) == list(range(10)), (inflight, got)
        assert svc.stats()["frames_done"] == 10


def test_profiler_table(rng):
    from shadernn_tpu.utils.profiler import print_report, profile_layers

    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions())
    profiles = profile_layers(
        eng, {"input": rng.random((1, 16, 24, 1), dtype=np.float32)}, iters=3
    )
    assert len(profiles) == len(g.nodes) - 1  # input excluded
    report = print_report(profiles)
    assert "Total GPU runtime" in report and "conv_1" in report
    conv2 = [p for p in profiles if p.name == "conv_2"][0]
    assert conv2.flops > 0 and conv2.ms > 0
