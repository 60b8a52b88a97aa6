"""Continuous batching of inference frame streams.

Generalizes the reference's real-time Android pipeline — `Engine` with a
`FrameQueue` ring of produce/consume items and a Node chain
(demo/android/.../engine.cpp:30-120, queues.h:26-100 SPSC queues,
demo/common/processingloop.cpp MainProcessingLoop) — into a multi-stream
continuous batcher:

- producers (camera streams, video feeds, RPC handlers) push frames into a
  bounded queue from any thread;
- a dispatcher thread drains up to `batch_size` frames, pads the batch to
  the fixed compiled shape (XLA recompiles on shape change, so batches are
  fixed-size buckets), runs ONE jitted step, and routes outputs back to
  each frame's stream;
- input buffers are donated to the step (the zero-copy analog of the
  reference's texture attach) since every frame is a fresh buffer.

On a multi-host slice each host runs one StreamingEngine feeding its local
queue; DP sharding over the `data` mesh axis spreads the global batch.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.utils import Timer, get_logger

logger = get_logger("snn_tpu.streaming")


@dataclasses.dataclass
class Frame:
    stream_id: int
    frame_id: int
    # (H, W, C) array for single-input graphs, or {input_name: array} for
    # multi-input graphs (e.g. a detection head fed per-scale features, or
    # the reference's Y+UV Calculate merge — calculationGL.cpp:28-57).
    data: object
    enqueue_time: float = 0.0


@dataclasses.dataclass
class Result:
    stream_id: int
    frame_id: int
    outputs: dict
    latency_s: float = 0.0
    batch_fill: int = 0


class FrameQueue:
    """Bounded MPSC frame queue (the reference's FrameQueue ring,
    engine.cpp:66-108, with blocking producer semantics)."""

    def __init__(self, capacity: int = 64):
        self._q: "queue.Queue[Optional[Frame]]" = queue.Queue(maxsize=capacity)

    def put(self, frame: Frame, timeout: Optional[float] = None) -> None:
        frame.enqueue_time = time.monotonic()
        self._q.put(frame, timeout=timeout)

    def get_batch(self, max_batch: int, wait_s: float) -> List[Optional[Frame]]:
        """Block for the first frame, then drain greedily up to max_batch
        within wait_s (continuous batching window)."""
        out: List[Optional[Frame]] = []
        try:
            first = self._q.get(timeout=wait_s if wait_s > 0 else None)
        except queue.Empty:
            return out
        out.append(first)
        deadline = time.monotonic() + wait_s
        while len(out) < max_batch:
            remaining = deadline - time.monotonic()
            try:
                item = self._q.get(timeout=max(remaining, 0.0) or 0.001)
            except queue.Empty:
                break
            out.append(item)
            if item is None:
                break
        return out

    def close(self) -> None:
        self._q.put(None)


class StreamingEngine:
    """Continuous-batching inference service over a compiled Engine."""

    def __init__(
        self,
        engine,
        on_result: Optional[Callable[[Result], None]] = None,
        queue_capacity: int = 64,
        batch_window_s: float = 0.002,
        ingest: Optional[dict] = None,
    ):
        """ingest: optional {"means": ..., "norms": ...} — producers then
        submit raw uint8 frames and the on-device ingest pipeline
        (image/ingest.py) is fused into the same step as the model, the
        full zero-copy path."""
        self.engine = engine
        self.queue = FrameQueue(queue_capacity)
        self.on_result = on_result
        self.batch_window_s = batch_window_s
        self.results: "queue.Queue[Result]" = queue.Queue()
        self.batch_size = engine.options.batch_size
        self.in_names = list(engine.graph.input_names)
        self.in_name = self.in_names[0]
        self._latencies: List[float] = []  # per-frame seconds (bounded)
        self.padded_frames = 0  # wasted compute: pad slots of partial batches
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.step_timer = Timer("step")
        self.frames_done = 0
        self.batches_run = 0
        self._step = None
        if ingest is not None:
            from shadernn_tpu.image.ingest import ingest_frames

            forward = engine.model.forward
            params = engine.model.params
            means = tuple(ingest.get("means", (0.0,)))
            norms = tuple(ingest.get("norms", (1 / 255.0,)))

            jit_kwargs = {}
            if engine.options.auto_output_layout:
                # Same serving optimization as the single-device Engine
                # path (engine/compile.py): let XLA keep the producer
                # layout for outputs instead of inserting a row-major
                # relayout copy (measured -107us on ESPCN 1080p b8).
                from jax.experimental.layout import Format, Layout

                jit_kwargs["out_shardings"] = Format(Layout.AUTO)

            @partial(jax.jit, **jit_kwargs)
            def fused_step(raw):
                x = ingest_frames(raw, means=means, norms=norms,
                                  dtype_name="float32")
                return forward(params, {self.in_name: x})

            self._step = fused_step

    # -- producer API ------------------------------------------------------
    def submit(self, stream_id: int, frame_id: int, data: np.ndarray) -> None:
        self.queue.put(Frame(stream_id, frame_id, data))

    # -- service lifecycle -------------------------------------------------
    def start(self) -> "StreamingEngine":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self, drain: bool = True) -> None:
        if drain:
            self.queue.close()
        else:
            self._stop.set()
            self.queue.close()
        if self._thread:
            self._thread.join()
            self._thread = None

    # -- dispatcher --------------------------------------------------------
    def _loop(self) -> None:
        while not self._stop.is_set():
            frames = self.queue.get_batch(self.batch_size, wait_s=0.25)
            if not frames:
                continue
            closed = frames and frames[-1] is None
            if closed:
                frames = frames[:-1]
            if frames:
                self._run_batch([f for f in frames if f is not None])
            if closed:
                break

    def _stack_padded(self, arrays: List[np.ndarray]) -> np.ndarray:
        batch = np.stack(arrays)
        if len(arrays) < self.batch_size:
            # Pad to the compiled fixed shape (bucket discipline: XLA would
            # otherwise recompile per batch size).
            pad = np.repeat(batch[-1:], self.batch_size - len(arrays), axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        return batch

    def _run_batch(self, frames: List[Frame]) -> None:
        fill = len(frames)
        self.padded_frames += self.batch_size - fill
        multi = isinstance(frames[0].data, dict)
        if multi:
            inputs = {
                name: jnp.asarray(
                    self._stack_padded([f.data[name] for f in frames])
                )
                for name in self.in_names
            }
        else:
            inputs = jnp.asarray(self._stack_padded([f.data for f in frames]))
        self.step_timer.start()
        if multi:
            outs = self.engine.model(inputs)
        elif self._step is not None:
            outs = self._step(inputs)
        else:
            outs = self.engine.model({self.in_name: inputs})
        outs = {k: np.asarray(v) for k, v in outs.items() if k != "__dumps__"}
        self.step_timer.stop()
        now = time.monotonic()
        self.batches_run += 1
        for i, f in enumerate(frames):
            res = Result(
                stream_id=f.stream_id,
                frame_id=f.frame_id,
                outputs={k: v[i] for k, v in outs.items()},
                latency_s=now - f.enqueue_time,
                batch_fill=fill,
            )
            if len(self._latencies) < 100_000:  # bounded history
                self._latencies.append(res.latency_s)
            self.frames_done += 1
            if self.on_result:
                self.on_result(res)
            else:
                self.results.put(res)

    # -- stats -------------------------------------------------------------
    def stats(self) -> dict:
        t = self.step_timer
        out = {
            "frames_done": self.frames_done,
            "batches_run": self.batches_run,
            "mean_batch_ms": 1e3 * t.mean,
            "avg_fill": self.frames_done / max(self.batches_run, 1),
            # wasted compute from padding partial batches to the bucket
            # shape — the serving-efficiency number avg_fill only hints at
            "padded_frames": self.padded_frames,
            "throughput_fps": self.frames_done / t.total if t.total else 0.0,
        }
        if self._latencies:
            lat = np.sort(np.asarray(self._latencies))
            out["p50_latency_ms"] = 1e3 * float(lat[len(lat) // 2])
            out["p99_latency_ms"] = 1e3 * float(
                lat[min(len(lat) - 1, int(len(lat) * 0.99))]
            )
        return out
