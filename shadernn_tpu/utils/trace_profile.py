"""In-situ profiling: parse a jax/XLA device trace of the *production*
program into a per-op time table that sums to the end-to-end latency.

Why this exists (replacing per-layer standalone timing as the primary
profile): the reference's DeviceTimer wraps each render stage of the real
run (core/inc/snn/deviceTimer.h:20-51, core.cpp:402-429). The round-1
analog re-ran each layer as its own device loop, which (a) disables chain
fusion so it doesn't measure the production program, and (b) has a ~2.5 ms
per-launch floor over remote-tunnel PJRT that swamps sub-ms layers. This
module instead captures a `jax.profiler` trace of the compiled step and
aggregates the XLA device events — the times are the real in-situ ones and
their sum is the step latency.

Attribution: XLA fuses across layer boundaries, so the table is per
HLO-op/fusion, each with its `source` (file:line) and long_name; Pallas
chain kernels appear as single custom-call events directly attributable to
their layer chain (CompiledModel.chain_plan). Every op row carries XLA's
own flops/bytes counters, giving exact achieved-roofline fractions
(the >=80% gate in BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import tempfile
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from shadernn_tpu.utils.profiler import PEAK_FLOPS, PEAK_HBM_GBS


@dataclasses.dataclass
class TraceOp:
    name: str
    category: str
    us: float  # per step
    flops: int  # XLA model_flops, per step
    bytes_accessed: int
    source: str
    long_name: str
    count: int = 1

    @property
    def tflops(self) -> float:
        return self.flops / (self.us * 1e-6) / 1e12 if self.us else 0.0

    @property
    def gbs(self) -> float:
        return self.bytes_accessed / (self.us * 1e-6) / 1e9 if self.us else 0.0

    def roofline_frac(self, peak_flops: float) -> float:
        if not self.us:
            return 0.0
        return max(self.tflops * 1e12 / peak_flops, self.gbs / PEAK_HBM_GBS)


@dataclasses.dataclass
class TraceReport:
    e2e_us: float  # whole-step device time (jit_* wrapper event)
    ops: List[TraceOp]  # sorted by time, descending
    steps: int
    precision: str = "bfloat16"

    @property
    def covered_us(self) -> float:
        return sum(o.us for o in self.ops)

    def by_category(self) -> Dict[str, float]:
        cats: Dict[str, float] = {}
        for o in self.ops:
            cats[o.category] = cats.get(o.category, 0.0) + o.us
        return dict(sorted(cats.items(), key=lambda kv: -kv[1]))

    def table(self, top: int = 30) -> str:
        peak = PEAK_FLOPS.get(self.precision, PEAK_FLOPS["bfloat16"])
        lines = [
            "===== In-situ device trace (per step) =====",
            f"  e2e {self.e2e_us / 1e3:.3f} ms; op rows cover "
            f"{self.covered_us / 1e3:.3f} ms "
            f"({100 * self.covered_us / max(self.e2e_us, 1e-9):.0f}%)",
            f"  {'op':<34} {'ms':>8} {'%e2e':>6} {'TFLOP/s':>8} {'GB/s':>7} "
            f"{'roofline':>9}  source",
        ]
        for o in self.ops[:top]:
            src = o.source.split("/")[-1] if o.source else ""
            lines.append(
                f"  {o.name:<34} {o.us / 1e3:8.4f} "
                f"{100 * o.us / max(self.e2e_us, 1e-9):5.1f}% "
                f"{o.tflops:8.2f} {o.gbs:7.1f} "
                f"{100 * o.roofline_frac(peak):8.1f}%  {src}"
            )
        lines.append("  -- by category: " + ", ".join(
            f"{k}={v / 1e3:.3f}ms" for k, v in self.by_category().items()
        ))
        return "\n".join(lines)


def parse_trace_dir(trace_dir: str, steps: int, precision: str = "bfloat16") -> TraceReport:
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])
    # device pid = process named like /device:TPU:0 (or TFRT_CPU)
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in str(e.get("args", {}).get("name", ""))
    }
    agg: Dict[str, TraceOp] = {}
    e2e_total = 0.0
    jit_counts: Dict[str, int] = {}
    jit_durs: Dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.startswith("pjit_"):
            e2e_total += float(e.get("dur", 0.0))
            jit_counts[name] = jit_counts.get(name, 0) + 1
            jit_durs[name] = jit_durs.get(name, 0.0) + float(e.get("dur", 0.0))
            continue
        args = e.get("args", {}) or {}
        dur = float(e.get("dur", 0.0))
        if name in agg:
            o = agg[name]
            o.us += dur
            o.count += 1
            o.flops += int(args.get("model_flops", 0) or 0)
            o.bytes_accessed += int(args.get("raw_bytes_accessed",
                                             args.get("bytes_accessed", 0)) or 0)
        else:
            agg[name] = TraceOp(
                name=name,
                category=str(args.get("hlo_category", "")),
                us=dur,
                flops=int(args.get("model_flops", 0) or 0),
                bytes_accessed=int(args.get("raw_bytes_accessed",
                                            args.get("bytes_accessed", 0)) or 0),
                source=str(args.get("source", "")),
                long_name=str(args.get("long_name", ""))[:200],
            )
    # Steps = invocations of the DOMINANT jit program (by total device
    # time), not the count of all jit events: a call can dispatch helper
    # programs too (e.g. an input-relayout program under auto input
    # layouts), and counting those as extra steps silently HALVES every
    # per-step number (found r5: 2 jit events/call made a 0.45 ms step
    # report as 0.31). e2e still sums ALL programs' device time — helper
    # programs are real per-step work. Fall back to the caller's step
    # count if the jit/pjit module event is absent from this trace
    # (event naming varies by backend/version) — otherwise
    # totals-over-all-steps would masquerade as per-step times.
    n_steps_seen = (
        jit_counts[max(jit_durs, key=jit_durs.get)] if jit_durs else 0
    )
    div = n_steps_seen if n_steps_seen else max(int(steps), 1)
    for o in agg.values():
        o.us /= div
        o.flops //= div
        o.bytes_accessed //= div
    ops = sorted(agg.values(), key=lambda o: -o.us)
    return TraceReport(
        e2e_us=e2e_total / div if n_steps_seen else sum(o.us for o in ops),
        ops=ops, steps=div, precision=precision,
    )


def trace_report(engine, inputs: Dict, steps: int = 5,
                 trace_dir: Optional[str] = None) -> TraceReport:
    """Capture a trace of the engine's compiled step and parse it."""
    from shadernn_tpu.utils.profiler import capture_trace

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="snn_trace_")
    capture_trace(engine, inputs, trace_dir, steps=steps)
    prec = {"fp32": "float32", "bf16": "bfloat16", "int8": "bfloat16"}[
        engine.options.precision.value
    ]
    return parse_trace_dir(trace_dir, steps, precision=prec)
