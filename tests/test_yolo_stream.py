"""End-to-end continuous-batched detection stream (BASELINE configs[4]).

Composes StreamingEngine -> on-device YOLO decode + NMS -> mAP, the
reference's defining real-time loop (demo/android/.../engine.cpp:30-120
frame queue + yololayer.cpp:113-226 decode/NMS). Ground truth is known
exactly: per-frame boxes are synthesized into YOLO head feature maps with
encode_grid (the inverse of the decode), so the stream's detections must
reproduce them — mAP ~ 1.0 is a REAL gate on the decode+NMS+streaming
composition, not a smoke test. Latency percentiles (p50/p99) come from
the stream's own stats, the serving-SLA numbers.
"""

import numpy as np

import shadernn_tpu as snn
from shadernn_tpu.engine.streaming import StreamingEngine
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.ops.yolo import (
    YOLOV3_TINY_ANCHORS, YOLOV3_TINY_MASKS, encode_grid,
)
from shadernn_tpu.utils.metrics import mean_average_precision

NUM_CLASSES = 4
NET = (416, 416)
BATCH = 4
N_FRAMES = 12


def _head_graph():
    """The yolov3-tiny head as a standalone graph: two per-scale feature
    inputs (grids 13 and 26) -> YOLO decode+NMS node."""
    b = GraphBuilder("yolo_head")
    a = len(YOLOV3_TINY_MASKS[0])
    no = a * (5 + NUM_CLASSES)
    h1 = b.input(13, 13, no, name="head_32")
    h2 = b.input(26, 26, no, name="head_16", index=1)
    b.yolo([h1, h2], num_classes=NUM_CLASSES, net_hw=NET,
           max_detections=20, name="yolo")
    return b.build()


def _random_boxes(rng, n_boxes):
    rows = []
    for _ in range(n_boxes):
        # sizes matched to the coarse-scale anchors (81x82, 135x169)
        w = rng.uniform(0.15, 0.35)
        h = rng.uniform(0.15, 0.35)
        x = rng.uniform(0.05, 0.9 - w)
        y = rng.uniform(0.05, 0.9 - h)
        rows.append([rng.integers(0, NUM_CLASSES), x, y, w, h])
    return np.asarray(rows, np.float32)


def _frames(seed=3):
    rng = np.random.default_rng(seed)
    gts, heads = [], []
    masks = YOLOV3_TINY_MASKS
    for _ in range(N_FRAMES):
        gt = _random_boxes(rng, int(rng.integers(1, 4)))
        gts.append(gt)
        f1 = encode_grid([gt], 13, 13, [YOLOV3_TINY_ANCHORS[m] for m in masks[0]],
                         NET, NUM_CLASSES)[0]
        # fine scale carries no objects for these anchor sizes
        f2 = encode_grid([np.zeros((0, 5), np.float32)], 26, 26,
                         [YOLOV3_TINY_ANCHORS[m] for m in masks[1]],
                         NET, NUM_CLASSES)[0]
        heads.append({"head_32": f1, "head_16": f2})
    return gts, heads


def test_detection_stream_map_and_latency():
    g = _head_graph()
    eng = snn.Engine.from_graph(
        g, snn.EngineOptions(precision=snn.Precision.FP32, batch_size=BATCH)
    )
    gts, heads = _frames()
    stream = StreamingEngine(eng).start()
    for i, data in enumerate(heads):
        stream.submit(stream_id=0, frame_id=i, data=data)
    stream.stop(drain=True)

    results = {}
    while not stream.results.empty():
        r = stream.results.get()
        results[r.frame_id] = r
    assert sorted(results) == list(range(N_FRAMES))

    dets = []
    for i in range(N_FRAMES):
        rows = results[i].outputs["yolo"]  # (max_det, 6)
        dets.append(rows[rows[:, 1] > 0])  # score>0 = kept by NMS
    mAP = mean_average_precision(dets, gts, NUM_CLASSES)
    assert mAP >= 0.95, mAP

    st = stream.stats()
    assert st["frames_done"] == N_FRAMES
    assert st["p50_latency_ms"] > 0 and st["p99_latency_ms"] >= st["p50_latency_ms"]
    assert st["padded_frames"] == 0  # 12 frames fill 3 full batches


def test_detection_count_matches_gt():
    """No spurious detections: kept-box count equals GT count per frame
    (clean encodes, NMS must not duplicate or drop)."""
    g = _head_graph()
    eng = snn.Engine.from_graph(
        g, snn.EngineOptions(precision=snn.Precision.FP32, batch_size=BATCH)
    )
    gts, heads = _frames(seed=11)
    for i in range(BATCH):
        out = np.asarray(
            eng.model(
                {k: np.asarray(v)[None] for k, v in heads[i].items()}
            )["yolo"]
        )[0]
        kept = out[out[:, 1] > 0]
        assert len(kept) == len(gts[i]), (len(kept), len(gts[i]))
