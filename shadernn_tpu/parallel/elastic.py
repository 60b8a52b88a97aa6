"""Elastic execution: device-failure detection and mesh rebuild.

The reference has no failure story (SNN_RIP aborts, utils.h:58-61;
single device). A multi-host TPU serving deployment needs at least:
detect a failed step, drop to the surviving devices, recompile, resume
(SURVEY.md §5 "detect host failure and rebuild the mesh").

`ElasticEngine` wraps engine construction: every step runs under a
watchdog; on a device/runtime failure it rebuilds the engine on a reduced
mesh (halving the data-parallel degree, the only axis whose loss is
capacity rather than correctness) and replays the failed batch. Failures
are injectable for testing (`inject_failure`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import numpy as np

from shadernn_tpu.config import EngineOptions, ShardingOptions
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.parallel.mesh import make_mesh
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.elastic")

# Exception types treated as device/runtime failures worth a rebuild.
_FAILURE_TYPES = (RuntimeError, jax.errors.JaxRuntimeError, OSError)


class ElasticEngine:
    def __init__(
        self,
        graph_builder: Callable[[], object],
        options: EngineOptions,
        max_rebuilds: int = 3,
    ):
        """graph_builder: zero-arg callable producing a fresh Graph (graphs
        are consumed by compilation; a rebuild needs a new one)."""
        self._builder = graph_builder
        self._options = options
        self._max_rebuilds = max_rebuilds
        self.rebuilds = 0
        self.failures = 0
        self._fail_next = 0  # test hook
        self._build()

    def _build(self) -> None:
        sharding = self._options.sharding
        mesh = make_mesh(sharding) if sharding.is_sharded else None
        self.engine = Engine.from_graph(self._builder(), self._options, mesh=mesh)
        logger.info(
            "elastic engine built: %d-way data parallel, batch %d",
            sharding.data, self._options.batch_size,
        )

    def inject_failure(self, count: int = 1) -> None:
        """Make the next `count` steps raise (tests the recovery path)."""
        self._fail_next += count

    def _shrink(self) -> bool:
        """Halve the data-parallel degree (and per-step batch). Returns
        False when no further shrink is possible."""
        sh = self._options.sharding
        if sh.data <= 1:
            # single device left: rebuild in place (process-level retry)
            return self.rebuilds < self._max_rebuilds
        new_sh = dataclasses.replace(sh, data=max(sh.data // 2, 1))
        new_batch = max(
            self._options.batch_size * new_sh.data // max(sh.data, 1), 1
        )
        self._options = dataclasses.replace(
            self._options, sharding=new_sh, batch_size=new_batch
        )
        return True

    def run(self, inputs: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """One step with failure recovery. The batch is re-bucketed to the
        current (possibly shrunk) batch size."""
        while True:
            try:
                if self._fail_next > 0:
                    self._fail_next -= 1
                    raise RuntimeError("injected device failure")
                return self._run_bucketed(inputs)
            except _FAILURE_TYPES as e:
                self.failures += 1
                logger.warning("step failed (%s); rebuilding engine", e)
                if self.rebuilds >= self._max_rebuilds or not self._shrink():
                    raise
                self.rebuilds += 1
                self._build()

    def _run_bucketed(self, inputs: Dict[str, np.ndarray]):
        batch = next(iter(inputs.values())).shape[0]
        step = self._options.batch_size
        if batch == step:
            return self.engine.run(inputs)
        # split/pad into fixed-size buckets and reassemble
        outs_parts = []
        for start in range(0, batch, step):
            chunk = {k: v[start : start + step] for k, v in inputs.items()}
            fill = next(iter(chunk.values())).shape[0]
            if fill < step:
                chunk = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], step - fill, axis=0)]
                    )
                    for k, v in chunk.items()
                }
            out = self.engine.run(chunk)
            outs_parts.append({k: np.asarray(v)[:fill] for k, v in out.items()
                               if k != "__dumps__"})
        return {
            k: np.concatenate([p[k] for p in outs_parts])
            for k in outs_parts[0]
        }

    @property
    def data_parallel_degree(self) -> int:
        return self._options.sharding.data
