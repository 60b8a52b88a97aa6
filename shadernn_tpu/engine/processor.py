"""InferenceProcessor: reference-compatible embedding API.

Mirrors `snn::InferenceProcessor` (demo/common/inferenceProcessor.h:32-92):
`initialize(params)` builds the engine, `preProcess` stages input frames,
`process` runs `inner_loops` iterations and collects benchmark stats with
the first `NUM_EXCLUDE_FIRST_LOOPS`=5 excluded (inferenceProcessor.cpp:90).
The texture in/out arrays become device arrays staged in HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.config import EngineOptions, Precision
from shadernn_tpu.engine.engine import Engine

NUM_EXCLUDE_FIRST_LOOPS = 5  # reference inferenceProcessor.cpp:90


@dataclasses.dataclass
class InitializationParameters:
    """Reference InferenceProcessor::InitializationParameters
    (inferenceProcessor.h:34-45), TPU-translated: half precision -> BF16,
    compute-shader/vulkan flags -> Pallas backend choice."""

    model_path: str = ""
    precision: Precision = Precision.FP32
    batch_size: int = 1
    dump_outputs: bool = False
    use_pallas: bool = False
    model_type: str = "other"  # other | classification | detection
    max_loops: int = 10


class InferenceProcessor:
    def __init__(self):
        self._engine: Optional[Engine] = None
        self._staged: Dict[str, jax.Array] = {}
        self._params: Optional[InitializationParameters] = None

    def initialize(self, cp: InitializationParameters, graph=None) -> None:
        from shadernn_tpu.config import BackendKind

        options = EngineOptions(
            precision=cp.precision,
            backend=BackendKind.PALLAS if cp.use_pallas else BackendKind.XLA,
            batch_size=cp.batch_size,
            dump_outputs=cp.dump_outputs,
        )
        if graph is not None:
            self._engine = Engine.from_graph(graph, options)
        else:
            self._engine = Engine.from_json(cp.model_path, options)
        self._params = cp

    @property
    def engine(self) -> Engine:
        assert self._engine is not None, "initialize() first"
        return self._engine

    def pre_process(self, inputs: Dict[str, np.ndarray]) -> None:
        """Stage input frames on device (analog of binding client textures,
        inferenceProcessor.cpp preProcess)."""
        self._staged = {k: jnp.asarray(v) for k, v in inputs.items()}
        jax.block_until_ready(self._staged)

    # camelCase aliases for drop-in familiarity with the reference API
    preProcess = pre_process

    def process(self) -> dict:
        """Run max_loops iterations on the staged inputs; returns outputs +
        benchmark stats (mean/stdev excluding first 5 loops)."""
        assert self._staged, "pre_process() first"
        eng = self.engine
        outs = None
        for _ in range(self._params.max_loops):
            eng.stats.total.start()
            outs = eng.model(self._staged)
            jax.block_until_ready(outs)
            eng.stats.total.stop()
        t = eng.stats.total.excluding_warmup(NUM_EXCLUDE_FIRST_LOOPS)
        result = {
            "outputs": outs,
            "mean_ms": 1e3 * t.mean,
            "stdev_ms": 1e3 * t.stdev(),
            "loops": t.count,
        }
        if self._params.model_type == "classification":
            first = outs[eng.graph.output_names[0]]
            result["class_index"] = np.asarray(jnp.argmax(first, axis=-1))
        elif self._params.model_type == "detection":
            result["detections"] = np.asarray(outs[eng.graph.output_names[0]])
        return result
