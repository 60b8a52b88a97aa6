"""Pipeline parallelism: stage the layer DAG across devices.

The reference executes its topologically-sorted RenderStages sequentially
on one GPU (core.cpp:294-432); here the same stage list is cut into
FLOP-balanced contiguous segments placed on different devices, with
micro-batched frames streamed through (GPipe-style inference). JAX's
async dispatch overlaps stage s of micro-batch i with stage s+1 of
micro-batch i-1; inter-stage transfers ride ICI via device_put.

This is the host-driven PP path (each stage is its own jitted program on
its own device or device group). It composes with DP inside a stage:
pass `devices` as a list of device-LISTS and each stage becomes a
1-axis ("data") sub-mesh — params are replicated across the group, each
micro-batch is batch-sharded over it, and inter-stage transfers resharde
via device_put with the next stage's NamedSharding (PP x DP; covered by
tests/test_pipeline.py::test_pipeline_dp_submesh on the 8-device CPU
mesh).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.config import EngineOptions
from shadernn_tpu.graph.ir import Graph, Node
from shadernn_tpu.ops.registry import RunCtx, get_op
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.pipeline")


@dataclasses.dataclass
class Stage:
    index: int
    nodes: List[Node]
    # graph values this stage consumes from earlier stages (node names)
    consumes: List[str]
    # values later stages (or the final output) need from this stage
    produces: List[str]
    flops: int
    device: object = None       # single device, or Mesh for a sub-mesh stage
    fn: object = None  # jitted env -> env
    params: dict = None

    @property
    def mesh(self):
        from jax.sharding import Mesh

        return self.device if isinstance(self.device, Mesh) else None

    def placement(self, batch_sharded: bool = True):
        """Where stage operands live: the device itself, or a
        NamedSharding on the stage's sub-mesh (batch axis 'data')."""
        m = self.mesh
        if m is None:
            return self.device
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(m, P("data") if batch_sharded else P())


def split_stages(graph: Graph, num_stages: int) -> List[Stage]:
    """Cut the topo order into contiguous, FLOP-balanced segments."""
    order = [n for n in graph.toposort() if n.op != "InputLayer"]
    flops = []
    for n in order:
        in_specs = [graph.nodes[i].out_spec for i in n.inputs]
        try:
            f = get_op(n.op).flops(n, in_specs)
        except Exception:
            f = 0
        # floor per node so zero-flop ops still cost something to move
        flops.append(max(f, sum(s.num_elements for s in in_specs)))
    total = sum(flops)
    num_stages = min(num_stages, len(order))
    prefix = np.cumsum(flops)
    # Quantile cuts (forced strictly increasing so we always get exactly
    # num_stages contiguous, non-empty segments).
    cuts: List[int] = []
    for q in range(1, num_stages):
        idx = int(np.searchsorted(prefix, total * q / num_stages)) + 1
        lo = (cuts[-1] if cuts else 0) + 1
        hi = len(order) - (num_stages - q)
        cuts.append(int(np.clip(idx, lo, hi)))
    bounds = [0] + cuts + [len(order)]

    stages: List[Stage] = []
    produced_by: Dict[str, int] = {n: -1 for n in graph.input_names}
    for s in range(len(bounds) - 1):
        seg = order[bounds[s] : bounds[s + 1]]
        for n in seg:
            produced_by[n.name] = s
        stages.append(Stage(s, seg, [], [], sum(flops[bounds[s] : bounds[s + 1]])))

    # dataflow across cuts
    for s, stage in enumerate(stages):
        needed = set()
        for n in stage.nodes:
            for i in n.inputs:
                if produced_by[i] != s:
                    needed.add(i)
        stage.consumes = sorted(needed)
    for s, stage in enumerate(stages):
        later_needs = set()
        for later in stages[s + 1 :]:
            later_needs.update(later.consumes)
        later_needs.update(graph.output_names)
        stage.produces = sorted(
            {n.name for n in stage.nodes} & later_needs
        )
    return stages


class PipelinedEngine:
    """Micro-batched pipelined inference over a stage-split graph."""

    def __init__(
        self,
        graph: Graph,
        options: Optional[EngineOptions] = None,
        devices: Optional[Sequence] = None,
        num_stages: Optional[int] = None,
        micro_batch: int = 1,
    ):
        from shadernn_tpu.engine.compile import _NodeView, extract_params

        self.graph = graph
        self.options = options or EngineOptions()
        devices = list(devices if devices is not None else jax.devices())
        # Each entry is either a single device (plain PP) or a LIST of
        # devices (PP x DP: the stage becomes a 1-axis "data" sub-mesh).
        if devices and isinstance(devices[0], (list, tuple)):
            from jax.sharding import Mesh

            devices = [Mesh(np.asarray(list(g)), ("data",)) for g in devices]
        num_stages = num_stages or len(devices)
        assert num_stages <= len(devices)
        self.micro_batch = micro_batch
        if any(n.out_spec is None for n in graph.nodes.values()):
            graph.infer_shapes(batch_size=micro_batch)
        self.stages = split_stages(graph, num_stages)
        all_params = extract_params(graph)
        act_dtype = self.options.precision.activation_dtype

        for stage, dev in zip(self.stages, devices):
            stage.device = dev
            if stage.mesh is not None:
                assert micro_batch % stage.mesh.size == 0, (
                    f"micro_batch {micro_batch} not divisible by stage "
                    f"{stage.index} sub-mesh size {stage.mesh.size}")
            stage.params = jax.device_put(
                {k: v for k, v in all_params.items()
                 if k in {n.name for n in stage.nodes}},
                stage.placement(batch_sharded=False),
            )

            def make_fn(stage):
                nodes = stage.nodes

                def run(params, env):
                    from shadernn_tpu.engine.compile import resolve_backend

                    env = dict(env)
                    for node in nodes:
                        view = _NodeView(node, params.get(node.name, {}))
                        xs = [env[i] for i in node.inputs]
                        ctx = RunCtx(
                            precision=self.options.precision,
                            backend=resolve_backend(node, self.graph, self.options),
                            sharding=self.options.sharding,
                        )
                        env[node.name] = get_op(node.op).run(view, xs, ctx)
                    return {k: env[k] for k in stage.produces}

                # No jit device= pin (deprecated): params and the staged
                # inputs are committed to this stage's device via
                # device_put, so placement follows the operands.
                return jax.jit(run)

            stage.fn = make_fn(stage)
        logger.info(
            "pipeline: %d stages, flops %s",
            len(self.stages),
            [f"{s.flops/1e6:.1f}M@{s.device}" for s in self.stages],
        )

    @staticmethod
    def _place(x, stage):
        """Move x to the stage's device / batch-sharding, skipping the
        transfer when it already lives there."""
        target = stage.placement()
        if stage.mesh is None:
            if getattr(x, "devices", lambda: None)() == {target}:
                return x
        elif getattr(x, "sharding", None) == target:
            return x
        return jax.device_put(x, target)

    def dispatch(self, inputs: Dict[str, np.ndarray],
                 _fns=None) -> List[Dict[str, jax.Array]]:
        """Issue all micro-batches through all stages WITHOUT blocking:
        returns the in-flight per-micro-batch output futures. The host
        runs ahead of the devices (jax async dispatch), which is what
        lets stage s of micro-batch i execute while stage s+1 chews on
        micro-batch i-1.

        _fns: optional per-stage (params, env, mb_idx) -> env override
        used by throughput_stats' schedule instrumentation."""
        batch = next(iter(inputs.values())).shape[0]
        mb = self.micro_batch
        assert batch % mb == 0, (batch, mb)
        act_dtype = self.options.precision.activation_dtype

        inflight = []
        for m in range(batch // mb):
            env = {
                k: jax.device_put(
                    jnp.asarray(v[m * mb : (m + 1) * mb]).astype(act_dtype),
                    self.stages[0].placement(),
                )
                for k, v in inputs.items()
            }
            for stage in self.stages:
                missing = [k for k in stage.consumes if k not in env]
                assert not missing, f"stage {stage.index} missing {missing}"
                # Only cross-stage tensors transfer (direct D2D, async;
                # resharded onto the stage's sub-mesh when it has one);
                # already-placed tensors pass through untouched.
                staged = {k: self._place(env[k], stage) for k in stage.consumes}
                if _fns is not None:
                    outs = _fns[stage.index](stage.params, staged, m)
                else:
                    outs = stage.fn(stage.params, staged)
                env.update(outs)
            inflight.append({o: env[o] for o in self.graph.output_names})
        return inflight

    def run(self, inputs: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """Split the batch into micro-batches, stream them through the
        stages (async dispatch overlaps stages across micro-batches), and
        re-assemble the global batch."""
        inflight = self.dispatch(inputs)
        jax.block_until_ready(inflight)
        return {
            o: jnp.concatenate([e[o].astype(jnp.float32) for e in inflight])
            for o in self.graph.output_names
        }

    def stage_devices(self) -> List[str]:
        return [str(s.device) for s in self.stages]

    def throughput_stats(self, inputs: Dict[str, np.ndarray], iters: int = 3) -> dict:
        """Measure pipeline overlap: per-stage serial time vs pipelined
        wall time, plus the GPipe bubble model.

        With S stages and M micro-batches the ideal pipelined time is
        (S + M - 1) * t_stage (t_stage = slowest stage), i.e. a bubble
        fraction of (S-1)/(S+M-1). `overlap_efficiency` compares the
        measured wall time against the NO-overlap serial schedule
        (sum of all stage times x M): > 1/S means stages genuinely ran
        concurrently; ~1.0 means perfect overlap of balanced stages.
        """
        import time

        batch = next(iter(inputs.values())).shape[0]
        m = batch // self.micro_batch
        s = len(self.stages)

        # warm both paths first so lazy jit compilation (seconds) does not
        # masquerade as serial execution time and inflate the speedup
        self.run(inputs)

        # serial: every micro-batch through every stage, blocking each step
        t0 = time.perf_counter()
        for _ in range(iters):
            mb_in = {k: v[: self.micro_batch] for k, v in inputs.items()}
            env = {
                k: jax.device_put(
                    jnp.asarray(v).astype(self.options.precision.activation_dtype),
                    self.stages[0].placement(),
                )
                for k, v in mb_in.items()
            }
            for stage in self.stages:
                staged = {k: jax.device_put(env[k], stage.placement())
                          for k in stage.consumes}
                outs = stage.fn(stage.params, staged)
                jax.block_until_ready(outs)
                env.update(outs)
        serial_mb_s = (time.perf_counter() - t0) / iters

        dispatch_s = 0.0
        t0 = time.perf_counter()
        for _ in range(iters):
            d0 = time.perf_counter()
            inflight = self.dispatch(inputs)
            dispatch_s += time.perf_counter() - d0
            jax.block_until_ready(inflight)
        wall_s = (time.perf_counter() - t0) / iters
        dispatch_s /= iters

        inversions = self._schedule_inversions(inputs)
        serial_total_s = serial_mb_s * m
        stats = {
            "stages": s,
            "micro_batches": m,
            "serial_s": round(serial_total_s, 5),
            "pipelined_s": round(wall_s, 5),
            "speedup": round(serial_total_s / max(wall_s, 1e-9), 3),
            "bubble_fraction_model": round((s - 1) / (s + m - 1), 4),
            "overlap_efficiency": round(
                serial_total_s / max(wall_s, 1e-9) / s, 3
            ),
            "dispatch_s": round(dispatch_s, 5),
            "dispatch_fraction": round(dispatch_s / max(wall_s, 1e-9), 3),
            # Deterministic schedule check (see _schedule_inversions): a
            # fully serialized pipeline executes (micro-batch, stage)
            # events strictly micro-batch-major and scores 0; genuine
            # cross-stage overlap produces out-of-order executions. Unlike
            # wall-clock speedup this does not depend on virtual CPU
            # devices sharing host cores.
            "schedule_inversions": inversions,
        }
        logger.info("pipeline throughput: %s", stats)
        return stats

    def _schedule_inversions(self, inputs: Dict[str, np.ndarray]) -> int:
        """Count out-of-micro-batch-order stage executions.

        Each stage is wrapped with an io_callback that records
        (micro-batch, stage, host time) WHEN THE STAGE EXECUTES on its
        device (the callback is data-dependent on the stage's first
        output). Sorting events by time, an "inversion" is an execution
        of micro-batch i after any execution of micro-batch j > i — i.e.
        stage s was still chewing on an earlier micro-batch while a later
        micro-batch had already advanced through an earlier stage. A
        blocking serial schedule (the serial baseline's shape) yields
        exactly 0; a pipelined schedule yields many (stage 0 rips through
        its queue while downstream stages lag)."""
        import threading
        import time

        from jax.experimental import io_callback

        events: List = []
        lock = threading.Lock()

        def record(mb_idx, stage_idx, _dep):
            with lock:
                events.append(
                    (int(mb_idx), int(stage_idx), time.perf_counter())
                )
            return np.int32(0)

        def make_inst(stage):
            inner = stage.fn

            @jax.jit
            def run(params, env, mb_idx):
                outs = inner(params, env)
                dep = list(outs.values())[0]
                io_callback(
                    record, jax.ShapeDtypeStruct((), np.int32),
                    mb_idx, stage.index, dep.reshape(-1)[0],
                    ordered=False,
                )
                return outs

            return run

        fns = {s.index: make_inst(s) for s in self.stages}
        inflight = self.dispatch(inputs, _fns=fns)
        jax.block_until_ready(inflight)
        with lock:
            evs = sorted(events, key=lambda e: e[2])
        inversions = 0
        max_mb_seen = -1
        for mb_idx, _stage, _t in evs:
            if mb_idx < max_mb_seen:
                inversions += 1
            max_mb_seen = max(max_mb_seen, mb_idx)
        return inversions
