"""Per-layer profiling and roofline reporting.

Replaces the reference's -DPROFILING machinery: per-stage async GPU timers
(core.cpp:402-429, glUtils.h GpuTimestamps) and the printTimingStats table
(core.cpp:436-460, expected output in docs/Developer-Guide/Benchmarking.md:20-45).

Per-layer times are measured by jitting each layer as its own device loop
(k iterations chained on device, scalar fetched — same protocol as
Engine.device_benchmark, needed because host timestamps are unreliable
over remote-tunnel PJRT). The report adds achieved FLOP/s and HBM GB/s
against peak (the >=80% roofline gate from BASELINE.md).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak numbers (per chip): 197 TFLOP/s bf16, 394 TOP/s int8, 819 GB/s HBM.
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 49e12, "int8": 394e12}
PEAK_HBM_GBS = 819.0


@dataclass
class LayerProfile:
    name: str
    op: str
    out_shape: tuple
    ms: float
    flops: int
    bytes_moved: int

    @property
    def tflops(self) -> float:
        return self.flops / (self.ms * 1e-3) / 1e12 if self.ms else 0.0

    @property
    def gbs(self) -> float:
        return self.bytes_moved / (self.ms * 1e-3) / 1e9 if self.ms else 0.0

    def roofline_frac(self, peak_flops: float = PEAK_FLOPS["bfloat16"]) -> float:
        """max of compute-roofline and memory-roofline utilization."""
        if not self.ms:
            return 0.0
        return max(
            self.flops / (self.ms * 1e-3) / peak_flops,
            self.gbs / PEAK_HBM_GBS,
        )


def _device_time(fn, args, iters: int = 20, repeats: int = 2) -> float:
    """Seconds per call, measured as a device-side loop."""

    def loop(args):
        def body(i, acc):
            eps = 1.0 + (i.astype(jnp.float32)) * 1e-6
            perturbed = jax.tree.map(
                lambda a: a * eps.astype(a.dtype)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                args,
            )
            out = fn(*perturbed)
            return acc + sum(
                jnp.sum(o).astype(jnp.float32) for o in jax.tree.leaves(out)
            )

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    j = jax.jit(loop)
    float(j(args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(j(args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def profile_layers(engine, inputs: Dict[str, np.ndarray], iters: int = 20) -> List[LayerProfile]:
    """Measure every layer of a compiled engine separately, feeding each
    the real intermediate activations."""
    from shadernn_tpu.engine.compile import _NodeView, resolve_backend
    from shadernn_tpu.ops.registry import RunCtx, get_op

    graph = engine.graph
    options = engine.options
    params = engine.model.params
    act_dtype = options.precision.activation_dtype

    env: Dict[str, jax.Array] = {}
    profiles: List[LayerProfile] = []
    for node in graph.toposort():
        if node.op == "InputLayer":
            env[node.name] = jnp.asarray(inputs[node.name]).astype(act_dtype)
            continue
        view = _NodeView(node, params.get(node.name, {}))
        ctx = RunCtx(
            precision=options.precision,
            backend=resolve_backend(node, graph, options),
            sharding=options.sharding,
        )
        op = get_op(node.op)
        xs = tuple(env[i] for i in node.inputs)

        def layer_fn(*args, _view=view, _op=op, _ctx=ctx):
            return _op.run(_view, list(args), _ctx)

        sec = _device_time(layer_fn, xs, iters=iters)
        out = jax.jit(layer_fn)(*xs)
        env[node.name] = out

        in_specs = [graph.nodes[i].out_spec for i in node.inputs]
        flops = op.flops(node, in_specs)
        bytes_moved = sum(
            s.num_elements * np.dtype(np.float32).itemsize // (2 if act_dtype == jnp.bfloat16 else 1)
            for s in in_specs if s is not None
        ) + node.out_spec.num_elements * (2 if act_dtype == jnp.bfloat16 else 4)
        bytes_moved += sum(int(np.prod(p.shape)) * p.dtype.itemsize
                           for p in node.params.values()) if node.params else 0
        profiles.append(
            LayerProfile(node.name, node.op, node.out_spec.shape, 1e3 * sec,
                         flops, bytes_moved)
        )
    return profiles


def print_report(profiles: List[LayerProfile], precision: str = "bfloat16") -> str:
    """Render the reference-style per-layer table (Benchmarking.md:20-45)
    extended with roofline columns."""
    peak = PEAK_FLOPS.get(precision, PEAK_FLOPS["bfloat16"])
    width = max([len(p.name) for p in profiles] + [8])
    lines = [
        "===== Time stats =====",
        f"  {'layer':<{width}} {'op':<18} {'ms':>9} {'TFLOP/s':>9} {'GB/s':>8} {'roofline':>9}",
    ]
    total = 0.0
    for p in profiles:
        total += p.ms
        lines.append(
            f"  [{p.name:<{width}}] {p.op:<16} {p.ms:9.4f} {p.tflops:9.2f} "
            f"{p.gbs:8.1f} {100 * p.roofline_frac(peak):8.1f}%"
        )
    lines.append(f"  Total GPU runtime: {total:.3f} ms")
    return "\n".join(lines)


def capture_trace(engine, inputs: Dict[str, np.ndarray], out_dir: str,
                  steps: int = 3) -> str:
    """Capture a jax/XLA profiler trace of engine steps (viewable in
    TensorBoard / Perfetto) — the deep-dive counterpart of the per-layer
    table, replacing the reference's GL timestamp queries."""
    import jax.profiler

    dev_inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    engine.model(dev_inputs)  # warm/compile outside the trace
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            out = engine.model(dev_inputs)
        jax.block_until_ready(out)
    return out_dir


def xla_cost_analysis(engine, inputs: Dict[str, np.ndarray]) -> dict:
    """XLA's own cost model for the whole compiled step (flops/bytes)."""
    lowered = jax.jit(engine.model.forward).lower(
        engine.model.params, {k: jnp.asarray(v) for k, v in inputs.items()}
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {k: ca.get(k) for k in ("flops", "bytes accessed") if ca and k in ca}
