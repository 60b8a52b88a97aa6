"""Continuous batching of inference frame streams.

Generalizes the reference's real-time Android pipeline — `Engine` with a
`FrameQueue` ring of produce/consume items and a Node chain
(demo/android/.../engine.cpp:30-120, queues.h:26-100 SPSC queues,
demo/common/processingloop.cpp MainProcessingLoop) — into a multi-stream
continuous batcher:

- producers (camera streams, video feeds, RPC handlers) push frames into a
  bounded queue from any thread;
- ONE dispatcher thread owns all device interaction: it drains up to
  `batch_size` frames, pads the batch to the fixed compiled shape (XLA
  recompiles on shape change, so batches are fixed-size buckets), and
  DISPATCHES one jitted step without waiting for its outputs (jax async
  dispatch), keeping up to `max_inflight` batches in flight;
- between dispatches the same thread polls the oldest in-flight batch's
  `is_ready()` and fetches+routes outputs once the device is done, so
  batch N+1 executes while batch N's outputs cross the link — the overlap
  the reference gets from its producer/consumer frame ring
  (queues.h:26-100) between the camera thread and the GL render thread.
  Keeping dispatch and fetch on one thread (poll, don't block) both
  avoids cross-thread runtime races and means the blocking read happens
  only when the result is already available;
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
import numpy as np

from shadernn_tpu.utils import get_logger

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
        max_inflight: int = 4,
    ):
        """ingest: optional {"means": ..., "norms": ...} — producers then
        submit raw uint8 frames and the on-device ingest pipeline
        (image/ingest.py) is fused into the same step as the model, the
        full zero-copy path.

        max_inflight: dispatched-but-undrained batch budget. Bounds HBM
        held by in-flight outputs while letting dispatch run ahead of the
        (possibly slow, e.g. remote-tunnel) output fetch."""
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
        # (frames, device outputs, fill) batches dispatched but not yet
        # fetched; owned exclusively by the dispatcher thread
        self._inflight: List[tuple] = []
        self.max_inflight = max(int(max_inflight), 1)
        self._stop = threading.Event()
        # Readiness-poll throttle: on a remote/tunnel device every
        # is_ready() probe is an RPC that competes with the actual
        # input/output transfers — un-throttled ~2 ms polling measured
        # 2-3x WORSE wall throughput than a serialized window (bench r5
        # A/B). 10 ms adds negligible latency vs real fetch times.
        self.poll_interval_s = 0.01
        self._last_poll = 0.0
        self._fetch_ms: List[float] = []  # per-batch blocking fetch times
        self.frames_done = 0
        self.batches_run = 0
        self._t_first_dispatch: Optional[float] = None
        self._t_last_drain: Optional[float] = None
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
        # Fresh wall window per start(): reusing an engine across runs must
        # not fold inter-run idle time into throughput_fps (ADVICE r4).
        self._t_first_dispatch = None
        self._t_last_drain = None
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
    @staticmethod
    def _batch_ready(outs: dict) -> bool:
        return all(
            getattr(v, "is_ready", lambda: True)() for v in outs.values()
        )

    def _loop(self) -> None:
        """Single-owner device loop: dispatch up to max_inflight batches
        ahead, fetch the oldest batch when the device has finished it (or
        when the in-flight window is full and we must wait)."""
        closed = False
        while not self._stop.is_set():
            # 1. retire every batch the device has already finished
            #    (readiness probes throttled — see poll_interval_s)
            now = time.monotonic()
            if self._inflight and now - self._last_poll >= self.poll_interval_s:
                self._last_poll = now
                while (
                    self._inflight
                    and self._batch_ready(self._inflight[0][1])
                ):
                    self._drain_one(*self._inflight.pop(0))
            # 2. full window: block on the oldest (device keeps chewing on
            #    the rest; the read itself is the only wait)
            if len(self._inflight) >= self.max_inflight:
                self._drain_one(*self._inflight.pop(0))
                continue
            if closed:
                if not self._inflight:
                    break
                # results pending but producer closed: poll cheaply
                time.sleep(0.0005)
                continue
            # 3. pick up new frames; poll quickly while work is in flight
            wait = 0.002 if self._inflight else 0.25
            frames = self.queue.get_batch(self.batch_size, wait_s=wait)
            if None in frames:
                closed = True
            # drop ALL sentinels: a twice-closed queue (pre-filled then
            # stop(drain)) can yield [None, None], and _run_batch must
            # never see an empty frame list
            frames = [f for f in frames if f is not None]
            if frames:
                self._run_batch(frames)
        # drain what's left after a hard stop
        while self._inflight:
            self._drain_one(*self._inflight.pop(0))

    def _stack_padded(self, arrays: List[np.ndarray]) -> np.ndarray:
        batch = np.stack(arrays)
        if len(arrays) < self.batch_size:
            # Pad to the compiled fixed shape (bucket discipline: XLA would
            # otherwise recompile per batch size).
            pad = np.repeat(batch[-1:], self.batch_size - len(arrays), axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        return batch

    def _run_batch(self, frames: List[Frame]) -> None:
        """DISPATCH one batch (no output fetch — jax async dispatch
        returns immediately) and append it to the in-flight window."""
        fill = len(frames)
        self.padded_frames += self.batch_size - fill
        multi = isinstance(frames[0].data, dict)
        # Hand the jitted step HOST arrays and let jit place the transfer:
        # pre-committing with jnp.asarray gives the input the device's
        # default layout, which can differ from the layout the compiled
        # executable expects for that parameter — jit then RECOMPILES for
        # the new layout (measured: a 200+ s remote recompile masquerading
        # as a slow first fetch).
        if multi:
            inputs = {
                name: self._stack_padded([f.data[name] for f in frames])
                for name in self.in_names
            }
        else:
            inputs = self._stack_padded([f.data for f in frames])
        if self._t_first_dispatch is None:
            self._t_first_dispatch = time.monotonic()
        if multi:
            outs = self.engine.model(inputs)
        elif self._step is not None:
            outs = self._step(inputs)
        else:
            outs = self.engine.model({self.in_name: inputs})
        outs = {k: v for k, v in outs.items() if k != "__dumps__"}
        self._inflight.append((frames, outs, fill))

    # -- drain ---------------------------------------------------------
    def _drain_one(self, frames: List[Frame], outs: dict, fill: int) -> None:
        """Fetch one in-flight batch's outputs and route results."""
        t0 = time.monotonic()
        # the one blocking host<->device read; batches dispatched after
        # this one are already executing on-device meanwhile
        outs = {k: np.asarray(v) for k, v in outs.items()}
        now = time.monotonic()
        self._t_last_drain = now
        self.batches_run += 1
        if len(self._fetch_ms) < 100_000:
            self._fetch_ms.append(1e3 * (now - t0))
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
        # wall window from first dispatch to last drained batch: the
        # honest serving rate with dispatch/fetch overlapped (t.total
        # alone would only count the blocking fetches)
        wall = (
            (self._t_last_drain - self._t_first_dispatch)
            if self._t_first_dispatch is not None
            and self._t_last_drain is not None
            else 0.0
        )
        out = {
            "frames_done": self.frames_done,
            "batches_run": self.batches_run,
            # mean residual blocking output-fetch time per batch (the
            # host<->device read; near zero once overlap hides it; on a
            # remote link dominated by the tunnel RTT). Renamed from the
            # pre-overlap `mean_batch_ms`, which measured per-batch step
            # time — a different quantity (ADVICE r4).
            "mean_fetch_ms": (
                float(np.mean(self._fetch_ms)) if self._fetch_ms else 0.0
            ),
            "avg_fill": self.frames_done / max(self.batches_run, 1),
            # wasted compute from padding partial batches to the bucket
            # shape — the serving-efficiency number avg_fill only hints at
            "padded_frames": self.padded_frames,
            "throughput_fps": self.frames_done / wall if wall else 0.0,
        }
        if self._latencies:
            lat = np.sort(np.asarray(self._latencies))
            out["p50_latency_ms"] = 1e3 * float(lat[len(lat) // 2])
            out["p99_latency_ms"] = 1e3 * float(
                lat[min(len(lat) - 1, int(len(lat) * 0.99))]
            )
        return out
