"""High-level inference engine.

The TPU-native `Engine` plays the role of the reference's
`InferenceProcessor` + `MixedInferenceCore` pair
(demo/common/inferenceProcessor.h:32-92, core/inc/snn/core.h:66-117):
load a model artifact, optimize + compile it, then run frames with
timing statistics. Postprocessing families mirror snn::ModelType
(classification argmax / detection boxes, core.cpp:228-238) but run
inside the jitted program.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import CompiledModel, compile_graph
from shadernn_tpu.graph import fusion
from shadernn_tpu.graph.ir import Graph
from shadernn_tpu.utils import TimingStats, get_logger

logger = get_logger("snn_tpu.engine")


class Engine:
    """Load -> optimize -> compile -> run.

    Usage:
        eng = Engine.from_graph(graph, EngineOptions(precision=Precision.BF16))
        out = eng.run({"input": frames})     # frames: (N, H, W, C)
    """

    def __init__(self, model: CompiledModel):
        self.model = model
        self.stats = TimingStats()
        self._runs = 0
        self._seen_batches: set = set()

    # -- construction ------------------------------------------------------
    @classmethod
    def from_graph(
        cls,
        graph: Graph,
        options: Optional[EngineOptions] = None,
        mesh=None,
        optimize: bool = True,
    ) -> "Engine":
        options = options or EngineOptions()
        if optimize:
            counts = fusion.optimize(graph, fold_bn=options.fold_batchnorm)
            logger.info("graph optimize: %s", counts)
        graph.infer_shapes(batch_size=options.batch_size)
        if options.precision.is_quantized:
            from shadernn_tpu.quant.quantize import quantize_graph_weights

            quantize_graph_weights(graph)
        logger.info("\n%s", graph.summary())
        return cls(compile_graph(graph, options, mesh=mesh))

    @classmethod
    def from_json(
        cls,
        path: Union[str, os.PathLike],
        options: Optional[EngineOptions] = None,
        mesh=None,
        input_hw: Optional[tuple] = None,
    ) -> "Engine":
        """Load a ShaderNN-format model artifact (JSON or _layers.json +
        _weights.bin pair — reference modelparser.cpp:238-260). `input_hw`
        re-targets the artifact to another frame size (weights are
        size-agnostic; the reference's processor resize path)."""
        from shadernn_tpu.graph.parser import parse_model_file

        graph = parse_model_file(path, input_hw=input_hw)
        return cls.from_graph(graph, options, mesh=mesh)

    # -- execution ---------------------------------------------------------
    @property
    def graph(self) -> Graph:
        return self.model.graph

    @property
    def options(self) -> EngineOptions:
        return self.model.options

    def _check_inputs(self, inputs: Dict[str, np.ndarray]) -> None:
        """Fail loudly on wrong frame shapes instead of silently retracing.

        The engine is fixed-shape like the reference core (textures are
        allocated once per graph, core.cpp:355-399): per-frame dims
        (H, W, C) must match the compiled specs exactly; a different batch
        size is allowed but triggers an XLA recompile, so warn once.
        """
        for name, spec in self.model.input_specs.items():
            if name not in inputs:
                raise KeyError(
                    f"missing input '{name}'; expected inputs "
                    f"{sorted(self.model.input_specs)}"
                )
            got = tuple(np.shape(inputs[name]))
            if len(got) != len(spec) or got[1:] != tuple(spec[1:]):
                raise ValueError(
                    f"input '{name}' has shape {got}, but the engine was "
                    f"compiled for (N, *{tuple(spec[1:])}); rebuild the "
                    f"graph (e.g. build_model(..., h=, w=)) for other sizes"
                )
            if got[0] != spec[0] and got[0] not in self._seen_batches:
                self._seen_batches.add(got[0])
                logger.warning(
                    "input '%s' batch %d != compiled batch %d: recompiling "
                    "(first call at this batch size will be slow)",
                    name, got[0], spec[0],
                )

    def run(self, inputs: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """One engine step over a batch of frames, timed.

        Times include host->device transfer of the inputs and blocking on
        the result — the per-frame latency the reference reports
        (inferenceProcessor.cpp:94-120).
        """
        self._check_inputs(inputs)
        self.stats.total.start()
        dev_inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        outs = self.model(dev_inputs)
        jax.block_until_ready(outs)
        self.stats.total.stop()
        self._runs += 1
        return outs

    def run_single(self, x: np.ndarray) -> jax.Array:
        (in_name,) = self.graph.input_names
        return self.run({in_name: x})[self.graph.output_names[0]]

    def classify(self, x: np.ndarray) -> np.ndarray:
        """Argmax postprocess (reference CLASSIFICATION path, core.cpp:228)."""
        logits = self.run_single(x)
        return np.asarray(jnp.argmax(logits, axis=-1))

    def device_benchmark(
        self, inputs: Dict[str, np.ndarray], iters: int = 50, repeats: int = 3
    ) -> dict:
        """True device throughput, immune to host<->device link latency.

        Runs `iters` forward passes chained inside one jitted
        `lax.fori_loop` (inputs perturbed per-iteration so XLA cannot CSE
        them away), reduces every output to one scalar, and fetches only
        that scalar — so the wall time is device compute, not transfer.
        Needed because over remote-tunnel PJRT transports,
        `block_until_ready` can return before compute finishes and big
        fetches are link-bandwidth-bound.
        """
        import jax.numpy as jnp
        from jax import lax

        forward = self.model.forward
        assert forward is not None

        def loop_fn(params, xs):
            def body(i, acc):
                eps = (i.astype(jnp.float32) + 1.0) * 1e-6
                outs = forward(params, {k: v * (1.0 + eps) for k, v in xs.items()})
                return acc + sum(
                    jnp.sum(o).astype(jnp.float32)
                    for o in jax.tree.leaves(outs)
                )

            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        looped = jax.jit(loop_fn)
        dev_inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        float(looped(self.model.params, dev_inputs))  # compile + warm
        import time as _time

        times = []
        for _ in range(repeats):
            t0 = _time.perf_counter()
            float(looped(self.model.params, dev_inputs))
            times.append(_time.perf_counter() - t0)
        batch = next(iter(dev_inputs.values())).shape[0]
        per_iter = min(times) / iters
        p50 = sorted(times)[len(times) // 2] / iters
        return {
            "mean_ms": 1e3 * per_iter,
            "p50_ms": 1e3 * p50,
            "p50_ms_per_frame": 1e3 * p50 / batch,
            "frames_per_sec": batch / per_iter,
            "iters": iters,
            "batch": batch,
        }

    def trace_benchmark(
        self, inputs: Dict[str, np.ndarray], steps: int = 20
    ) -> dict:
        """In-situ device-time benchmark via the jax profiler trace.

        Submits `steps` compiled steps back-to-back and reads each step's
        actual device execution window from the trace — the ground-truth
        per-step chip time (the fori_loop protocol in device_benchmark
        adds per-iteration perturbation/reduction work that inflates small
        models ~3x; the reference's DeviceTimer measured in-situ for the
        same reason, deviceTimer.h:20-51). Returns step stats plus the
        parsed per-op report under "report".
        """
        import shutil
        import tempfile

        from shadernn_tpu.utils.trace_profile import parse_trace_dir

        def fresh():
            # donate_input engines consume their input buffers each call;
            # rebuild them per step so the traced loop doesn't reuse a
            # deleted array.
            return {k: jnp.asarray(np.asarray(v)) for k, v in inputs.items()}

        donating = self.options.donate_input
        dev_inputs = fresh()
        jax.block_until_ready(self.model(dev_inputs))  # compile + warm
        trace_dir = tempfile.mkdtemp(prefix="snn_bench_trace_")
        try:
            with jax.profiler.trace(trace_dir):
                out = None
                for _ in range(steps):
                    out = self.model(fresh() if donating else dev_inputs)
                jax.block_until_ready(out)
            prec = {"fp32": "float32", "bf16": "bfloat16", "int8": "bfloat16"}[
                self.options.precision.value
            ]
            report = parse_trace_dir(trace_dir, steps, precision=prec)
        finally:
            shutil.rmtree(trace_dir, ignore_errors=True)
        batch = next(iter(dev_inputs.values())).shape[0]
        ms = report.e2e_us / 1e3
        return {
            "device_ms_per_step": ms,
            "device_ms_per_frame": ms / batch,
            "frames_per_sec": batch / (ms / 1e3) if ms else 0.0,
            "steps": report.steps,
            "batch": batch,
            "report": report,
        }

    # -- reporting ---------------------------------------------------------
    def time_report(self) -> str:
        return self.stats.report(warmup=self.options.warmup_loops)

    def benchmark(self, inputs: Dict[str, np.ndarray], loops: int = 20) -> dict:
        """Run `loops` iterations; returns mean/p50 latency and frames/s
        excluding the first `warmup_loops` (reference
        NUM_EXCLUDE_FIRST_LOOPS=5, inferenceProcessor.cpp:90)."""
        dev_inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        start_idx = self.stats.total.count
        for _ in range(loops):
            self.stats.total.start()
            outs = self.model(dev_inputs)
            jax.block_until_ready(outs)
            self.stats.total.stop()
        # this call's samples only; don't let warmup exclusion consume all
        warmup = min(self.options.warmup_loops, max(loops - 1, 0))
        t = self.stats.total.excluding_warmup(start_idx + warmup)
        batch = next(iter(dev_inputs.values())).shape[0]
        samples = sorted(t.samples)
        p50 = samples[len(samples) // 2] if samples else 0.0
        return {
            "mean_ms": 1e3 * t.mean,
            "p50_ms": 1e3 * p50,
            "min_ms": 1e3 * t.min,
            "stdev_ms": 1e3 * t.stdev(),
            "frames_per_sec": batch / t.mean if t.mean else 0.0,
            "loops": t.count,
            "batch": batch,
        }
