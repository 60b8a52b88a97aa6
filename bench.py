#!/usr/bin/env python
"""Benchmark CLI. Prints ONE JSON line for the driver:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: ESPCN 2x 540p frames/sec/chip (BASELINE.json configs[0]).
vs_baseline compares against the reference's only published figure: 775.194
ms per ESPCN_2X inference on its target phone GPU
(docs/Developer-Guide/Benchmarking.md:25-45) = 1.29 frames/s.

The "extra" dict carries the other BASELINE.md gates: MobileNetV2-INT8
frames/sec/chip, p50 per-frame latency, compile time, and the measured
Pallas-kernel roofline fractions (true-FLOP accounting).

Measurement protocol: `Engine.trace_benchmark` reads each step's device
execution window from a jax profiler trace (in-situ, immune to the remote
-tunnel host<->device link); falls back to the device-side fori_loop
protocol (`Engine.device_benchmark`) if trace capture is unavailable.

Flag surface follows the reference test binaries (--use_half -> --precision,
--inner_loops, --dump_outputs; inferenceProcessorTest.cpp:95-106).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: kernel-heavy models recompile in
# seconds instead of minutes on repeat runs. Repo-local so driver runs
# on the same checkout start warm. NOTE: must go through jax.config, not
# env vars — the container's sitecustomize imports jax before this module
# runs, so JAX_COMPILATION_CACHE_DIR would be read too late and silently
# ignored (observed: no .jax_cache dir after repeated 120-180s compiles).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
from shadernn_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.join(_REPO, ".jax_cache"))

REFERENCE_ESPCN_MS = 775.194  # docs/Developer-Guide/Benchmarking.md:25
# NOTE: since round 2 the headline default is --output_dtype=activation
# (bf16 outputs, like the reference's fp16 textures). Rounds 0-1 measured
# f32 outputs; see docs/Benchmarking.md "Baseline-comparison note" before
# comparing frames/s across rounds. extra.output_dtype records the contract.


def bench_model(name: str, precision: str, batch: int, loops: int, log,
                backend_name: str = "auto", protocol: str = "trace",
                output_dtype: str = "float32", **build_kwargs):
    import shadernn_tpu as snn
    from shadernn_tpu.models import build_model

    prec = {"fp32": snn.Precision.FP32, "bf16": snn.Precision.BF16,
            "int8": snn.Precision.INT8}[precision]
    backend = {"auto": snn.BackendKind.AUTO, "xla": snn.BackendKind.XLA,
               "pallas": snn.BackendKind.PALLAS}[backend_name]
    graph = build_model(name, **build_kwargs)
    t0 = time.time()
    eng = snn.Engine.from_graph(
        graph, snn.EngineOptions(precision=prec, batch_size=batch,
                                 backend=backend, output_dtype=output_dtype,
                                 auto_output_layout=(
                                     output_dtype == "activation"))
    )
    in_spec = graph.nodes[graph.input_names[0]].out_spec.shape
    x = np.random.default_rng(0).random((batch, *in_spec[1:]), dtype=np.float32)
    inputs = {graph.input_names[0]: x}
    stats = None
    if protocol == "trace":
        try:
            tstats = eng.trace_benchmark(inputs, steps=loops)
            report = tstats.pop("report")
            stats = {
                "mean_ms": tstats["device_ms_per_step"],
                "p50_ms": tstats["device_ms_per_step"],
                "p50_ms_per_frame": tstats["device_ms_per_frame"],
                "frames_per_sec": tstats["frames_per_sec"],
                "iters": tstats["steps"],
                "batch": batch,
                "protocol": "trace",
            }
            stats["_report"] = report
        except Exception as e:  # trace capture unavailable: fall back
            log(f"{name}: trace protocol failed ({type(e).__name__}: {e}); "
                "falling back to device loop")
    if stats is None:
        stats = eng.device_benchmark(inputs, iters=loops)
        stats["protocol"] = "loop"
    stats["compile_s"] = round(
        time.time() - t0 - stats["mean_ms"] * loops / 1e3, 1
    )
    loggable = {k: v for k, v in stats.items() if not k.startswith("_")}
    log(f"{name} {precision} b{batch}: {loggable}")
    stats["_graph"] = graph
    stats["_forward"] = eng.model.forward
    return stats


WARM_COMPILE_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
from shadernn_tpu.utils import enable_compile_cache
enable_compile_cache({cache!r})
import jax
from jax._src import monitoring as _mon
_hits = [0]
_reqs = [0]
_retrieval_s = [0.0]
def _ev(name, **kw):
    if name == "/jax/compilation_cache/cache_hits":
        _hits[0] += 1
    elif name == "/jax/compilation_cache/compile_requests_use_cache":
        _reqs[0] += 1
def _dur(name, secs, **kw):
    if name == "/jax/compilation_cache/cache_retrieval_time_sec":
        _retrieval_s[0] += secs
_mon.register_event_listener(_ev)
_mon.register_event_duration_secs_listener(_dur)
import numpy as np, shadernn_tpu as snn
from shadernn_tpu.models import build_model
t0 = time.time()
eng = snn.Engine.from_graph(build_model({name!r}), snn.EngineOptions(
    precision=snn.Precision.{prec}, batch_size={batch}))
x = np.random.default_rng(0).random((1, *eng.model.input_specs[
    eng.model.graph.input_names[0]][1:]), dtype=np.float32)
eng.model.run_single(np.repeat(x, {batch}, 0))
print("WARM_COMPILE_S", round(time.time() - t0, 1))
print("CACHE_HITS", _hits[0])
print("CACHE_MISSES", max(_reqs[0] - _hits[0], 0))
print("CACHE_RETRIEVAL_S", round(_retrieval_s[0], 2))
"""


def warm_compile_s(name: str, prec: str, batch: int, log) -> dict:
    """Cold-start story (VERDICT r2 #5): rebuild the engine in a FRESH
    process and time compile+first-run. A warm persistent/remote-compile
    cache must bring this to seconds; in-process re-creation would only
    test jax's in-memory executable cache and prove nothing.

    The subprocess now also counts persistent-cache hits/misses via jax
    monitoring events and reports the executable-retrieval time, so the
    cache HIT is ASSERTED in the bench output instead of narrated
    (VERDICT r4 #8): compile_cache_hit = (hits > 0 and misses == 0), and
    the warm wall splits into {retrieval, other (executable load + run)}.
    """
    import subprocess

    code = WARM_COMPILE_SNIPPET.format(
        repo=_REPO, cache=os.path.join(_REPO, ".jax_cache"),
        name=name, prec=prec, batch=batch,
    )
    out = {}
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=900,
                           capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("WARM_COMPILE_S"):
                out["warm_compile_s"] = float(line.split()[1])
            elif line.startswith("CACHE_HITS"):
                out["cache_hits"] = int(line.split()[1])
            elif line.startswith("CACHE_MISSES"):
                out["cache_misses"] = int(line.split()[1])
            elif line.startswith("CACHE_RETRIEVAL_S"):
                out["cache_retrieval_s"] = float(line.split()[1])
        if "warm_compile_s" not in out:
            log(f"warm-compile subprocess gave no result: {r.stderr[-300:]}")
    except Exception as e:
        log(f"warm-compile subprocess failed: {e}")
    return out


def _chain_roofline(stats, log, batch: int) -> dict:
    """Measured roofline for the Pallas chain kernels (BASELINE.md >=80%
    gate). Two accountings:

      - true-FLOP fraction of MXU peak (the naive gate number);
      - achieved vs the kernel's BINDING bound. For the packed-column
        format the binding resource is padded MXU slots (weight-matrix
        zeros + halo recompute are issued to the MXU and cost real
        cycles); chain_packed_pallas.mxu_slot_flops computes that bound
        from the recorded specs and the gate is achieved >= 80% of it.
    """
    report = stats.get("_report")
    graph = stats.get("_graph")
    if report is None or graph is None:
        return {}
    from shadernn_tpu.ops.registry import get_op
    from shadernn_tpu.utils.profiler import PEAK_FLOPS, PEAK_HBM_GBS

    # true flops of the conv chain (all Conv2D nodes; ESPCN is one chain)
    conv_flops = 0
    for n in graph.nodes.values():
        if n.op == "Conv2D":
            in_specs = [graph.nodes[i].out_spec for i in n.inputs]
            conv_flops += get_op(n.op).flops(n, in_specs)
    kernels = [o for o in report.ops
               if o.category == "custom-call" or o.name.startswith("forward")]
    if not kernels:
        return {}
    k_us = sum(o.us for o in kernels)
    peak = PEAK_FLOPS.get(report.precision, PEAK_FLOPS["bfloat16"])
    tflops = conv_flops / (k_us * 1e-6) / 1e12 if k_us else 0.0
    frac = tflops * 1e12 / peak
    k_bytes = sum(o.bytes_accessed for o in kernels)
    gbs = k_bytes / (k_us * 1e-6) / 1e9 if k_us else 0.0
    out = {
        "chain_kernel_ms": round(k_us / 1e3, 4),
        "chain_kernel_tflops_true": round(tflops, 2),
        "chain_kernel_roofline_pct": round(100 * max(frac, gbs / PEAK_HBM_GBS), 1),
    }
    # Binding-bound model for the packed format: padded-MXU-slot floor.
    pcs = getattr(stats.get("_forward"), "packed_chain_specs", None)
    if pcs:
        from shadernn_tpu.kernels.chain_packed_pallas import mxu_slot_flops

        slot_flops = batch * sum(
            mxu_slot_flops(specs, h, w) for specs, h, w in pcs.values()
        )
        bound_ms = slot_flops / peak * 1e3
        out["chain_kernel_bound_ms"] = round(bound_ms, 4)
        out["chain_kernel_pct_of_bound"] = round(100 * bound_ms / (k_us / 1e3), 1)
    log(f"chain kernel roofline: {out}")
    return out


def _measure_launch_us(log) -> float:
    """Per-pallas-kernel dispatch overhead: time a jitted chain of k
    trivial kernels for two k and difference them (the kernels' own work
    is a (8,128) copy, ~ nothing)."""
    import functools
    import time as _t

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def triv(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def chain(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = pl.pallas_call(
                    triv,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(x)
            return x
        return f

    x = jnp.zeros((8, 128), jnp.float32)
    times = {}
    for k in (2, 12):
        f = chain(k)
        jax.block_until_ready(f(x))
        best = 9e9
        for _ in range(3):
            t0 = _t.monotonic()
            for _ in range(50):
                y = f(x)
            jax.block_until_ready(y)
            best = min(best, (_t.monotonic() - t0) / 50)
        times[k] = best
    launch = max((times[12] - times[2]) / 10 * 1e6, 0.0)
    log(f"pallas launch overhead: {launch:.2f} us/kernel "
        f"(k2 {times[2]*1e6:.1f} us, k12 {times[12]*1e6:.1f} us)")
    return launch


def _block_roofline(stats, log, batch: int) -> dict:
    """Per-kernel roofline for the fused inverted-residual block kernels
    (kernels/block_pallas.py): true FLOPs of the fused members vs the
    custom-call time attributed to the block kernels in the trace, PLUS
    the BINDING bound (VERDICT r3 #2): per-block issued-work floors
    (padded MXU slots + measured-rate VPU depthwise + HBM, see
    block_pallas.invres_floor_us) plus the measured per-kernel dispatch
    overhead."""
    report = stats.get("_report")
    graph = stats.get("_graph")
    fwd = stats.get("_forward")
    if report is None or graph is None or not getattr(fwd, "block_plan", None):
        return {}
    from shadernn_tpu.ops.registry import get_op
    from shadernn_tpu.utils.profiler import PEAK_FLOPS, PEAK_HBM_GBS

    members = {n for names in fwd.block_plan.values() for n in names}
    flops = 0
    dw_flops = 0  # the VPU component (9 masked FMAs per pixel-channel)
    mm_flops = 0  # the MXU component (the two 1x1 matmuls)
    for name in members:
        n = graph.nodes[name]
        in_specs = [graph.nodes[i].out_spec for i in n.inputs]
        try:
            f = get_op(n.op).flops(n, in_specs)
        except Exception:
            continue
        flops += f
        if n.op == "SeparableConv2D":
            dw_flops += f
        elif n.op == "Conv2D":
            mm_flops += f
    kernels = [o for o in report.ops
               if o.category == "custom-call" or o.name.startswith("forward")]
    if not kernels or not flops:
        return {}
    k_us = sum(o.us for o in kernels)
    peak = PEAK_FLOPS.get(report.precision, PEAK_FLOPS["bfloat16"])
    tflops = flops / (k_us * 1e-6) / 1e12 if k_us else 0.0
    k_bytes = sum(o.bytes_accessed for o in kernels)
    gbs = k_bytes / (k_us * 1e-6) / 1e9 if k_us else 0.0
    out = {
        "block_kernels_ms": round(k_us / 1e3, 4),
        "block_kernels_tflops_true": round(tflops, 2),
        "block_kernels_roofline_pct": round(
            100 * max(tflops * 1e12 / peak, gbs / PEAK_HBM_GBS), 1
        ),
        "block_kernels_hbm_gbs": round(gbs, 1),
        # component split for the binding-bound argument (DEVNOTES r3):
        # the depthwise runs as 9 masked VPU FMAs (not MXU), so the MXU
        # fraction alone understates how close the kernel is to ITS wall.
        "block_dw_vpu_gflop": round(dw_flops / 1e9, 2),
        "block_matmul_gflop": round(mm_flops / 1e9, 2),
    }
    # BINDING bound: per-block issued-work floors (MXU slots + the dw's
    # VMEM-stream term + HBM — block_pallas.invres_floor_us). Dispatch is
    # reported in the split but NOT added to the bound: its wall-clock
    # micro-measurement is tunnel-weather noisy (observed 0-2.6 us/kernel
    # across runs, enough to push a summed bound past the measured time).
    block_specs = getattr(fwd, "block_specs", None)
    if block_specs:
        from shadernn_tpu.kernels.block_pallas import invres_floor_us

        floors = [
            invres_floor_us(spec, nb, 2)  # bf16 activations
            for spec, nb in block_specs.values()
        ]
        bound_us = sum(f["floor_us"] for f in floors)
        launch_us = _measure_launch_us(log)
        out["block_kernels_bound_ms"] = round(bound_us / 1e3, 4)
        out["block_kernels_pct_of_bound"] = round(100 * bound_us / k_us, 1)
        out["block_bound_split_us"] = {
            "mxu": round(sum(f["mxu_us"] for f in floors), 1),
            "vpu_dw": round(sum(f["vpu_us"] for f in floors), 1),
            "hbm": round(sum(f["hbm_us"] for f in floors), 1),
            "dispatch_informational": round(launch_us * len(floors), 1),
        }
    log(f"block kernels roofline: {out}")
    return out


def _prod_shape_validation(log) -> dict:
    """Numerical gate at the PRODUCTION shape on the real chip: Pallas
    (packed chain) vs XLA at 540p bf16. Tiny-shape CI cannot catch
    tiling/DMA-shape bugs that only manifest at real extents (interpret
    mode does not check DMA shapes — DEVNOTES r2); this runs the check
    where it matters and lands the result in the driver JSON."""
    import shadernn_tpu as snn
    from shadernn_tpu.models import build_model

    x = np.random.default_rng(7).random((2, 540, 960, 1), dtype=np.float32)
    outs = {}
    for backend in (snn.BackendKind.PALLAS, snn.BackendKind.XLA):
        eng = snn.Engine.from_graph(
            build_model("espcn"),
            snn.EngineOptions(precision=snn.Precision.BF16, batch_size=2,
                              backend=backend),
        )
        outs[backend] = np.asarray(eng.model.run_single(x), np.float32)
    diff = float(np.max(np.abs(outs[snn.BackendKind.PALLAS]
                               - outs[snn.BackendKind.XLA])))
    out = {"prod_shape_max_abs_diff": round(diff, 5),
           "prod_shape_validation": "pass" if diff < 0.1 else "FAIL"}
    log(f"production-shape validation (540p bf16 pallas-vs-xla): {out}")
    return out


def _a8w8_bench(batch: int, loops: int, log, model: str = "mobilenetv2") -> dict:
    """INT8 ACTIVATIONS (A8W8, VERDICT r2 #7): calibrate activation
    scales, rebuild, and A/B against the weight-only engine — fps +
    output agreement both reported. mobilenetv2 engages the fused-block
    kernel's in-kernel quantizers; resnet18 (C>=32 standard convs) the
    XLA int8 x int8 conv path (ops/conv.py A8W8 branch)."""
    import shadernn_tpu as snn
    from shadernn_tpu.models import build_model
    from shadernn_tpu.quant.calibrate import calibrate_activations

    g = build_model(model)
    opts = snn.EngineOptions(precision=snn.Precision.INT8, batch_size=batch)
    eng_w = snn.Engine.from_graph(g, opts)  # weight-only (quantizes graph)
    rng = np.random.default_rng(0)
    spec = g.nodes[g.input_names[0]].out_spec.shape
    x = rng.random((batch, *spec[1:]), dtype=np.float32)
    calibrate_activations(
        eng_w, [{g.input_names[0]: x}], percentile=None
    )
    eng_a = snn.Engine.from_graph(g, opts)  # act_scale attrs now engage A8W8
    tstats = eng_a.trace_benchmark({g.input_names[0]: x}, steps=loops)
    out_w = np.asarray(eng_w.model.run_single(x), np.float32)
    out_a = np.asarray(eng_a.model.run_single(x), np.float32)
    agree = float(np.mean(out_w.argmax(-1) == out_a.argmax(-1)))
    out = {
        f"{model}_a8w8_frames_per_sec": round(tstats["frames_per_sec"], 1),
        f"{model}_a8w8_top1_agreement": round(agree, 4),
    }
    log(f"{model} a8w8: {out}")
    return out


def _chain_int8_bench(batch: int, loops: int, log) -> dict:
    """INT8 packed chain A/B (VERDICT r4 #3, carried from r3 #6): ESPCN
    540p under an INT8 engine, chain_a8 auto (int8 x int8 dots where the
    layer's input range is calibrated) vs chain_a8 off (weight-only int8,
    bf16 dots). Int8 dots issue MXU slots at double rate, halving the
    kernel's slot bound — mxu_slot_flops counts int8-dot layers at half
    weight, so pct_of_bound stays comparable across modes."""
    import jax

    import shadernn_tpu as snn
    from shadernn_tpu.models import build_model
    from shadernn_tpu.quant.calibrate import calibrate_activations
    from shadernn_tpu.utils.profiler import PEAK_FLOPS

    g = build_model("espcn")
    rng = np.random.default_rng(0)
    x = rng.random((batch, 540, 960, 1), dtype=np.float32)
    kw = dict(precision=snn.Precision.INT8, batch_size=batch,
              output_dtype="activation", auto_output_layout=True)
    eng_cal = snn.Engine.from_graph(g, snn.EngineOptions(**kw, chain_a8="off"))
    calibrate_activations(eng_cal, [{"input": x}], percentile=None)
    out = {}
    outs = {}
    for mode in ("off", "auto"):
        eng = snn.Engine.from_graph(g, snn.EngineOptions(**kw, chain_a8=mode))
        tstats = eng.trace_benchmark({"input": x}, steps=loops)
        rep = tstats.pop("report")
        kernels = [o for o in rep.ops
                   if o.category == "custom-call" or o.name.startswith("forward")]
        k_us = sum(o.us for o in kernels)
        tag = "chain_int8" if mode == "auto" else "chain_w8"
        out[f"{tag}_frames_per_sec"] = round(tstats["frames_per_sec"], 1)
        out[f"{tag}_kernel_ms"] = round(k_us / 1e3, 4)
        pcs = getattr(eng.model.forward, "packed_chain_specs", {})
        if pcs and k_us:
            from shadernn_tpu.kernels.chain_packed_pallas import mxu_slot_flops

            slot_flops = batch * sum(
                mxu_slot_flops(specs, h, w) for specs, h, w in pcs.values()
            )
            bound_ms = slot_flops / PEAK_FLOPS["bfloat16"] * 1e3
            out[f"{tag}_bound_ms"] = round(bound_ms, 4)
            out[f"{tag}_pct_of_bound"] = round(100 * bound_ms / (k_us / 1e3), 1)
            if mode == "auto":
                out["chain_int8_layers"] = sum(
                    1 for specs, _h, _w in pcs.values()
                    for s in specs if s.in_q > 0
                )
        outs[mode] = np.asarray(
            jax.device_get(eng.model.run_single(x)), np.float32
        )
    out["chain_int8_max_abs_diff_vs_w8"] = round(
        float(np.max(np.abs(outs["auto"] - outs["off"]))), 5
    )
    log(f"chain int8 A/B: {out}")
    return out


def _stream_bench(batch: int, log, seconds: float = 3.0) -> dict:
    """Continuous-batched YOLOv3-tiny video stream (BASELINE configs[4]):
    full-model frames through StreamingEngine -> on-device decode+NMS.

    Reports BOTH sides of the link (VERDICT r3 #5): wall fps / p50 / p99
    from the stream's own stats (includes the remote-tunnel RTT, but with
    dispatch/fetch overlapped batch N+1 executes while batch N's outputs
    cross the link), and the DEVICE-side step time from a jax profiler
    trace captured around the live stream — the on-device serving rate.
    """
    import tempfile
    import threading
    import time as _t  # noqa: F401  (kept for ad-hoc timing edits)

    import jax

    import shadernn_tpu as snn
    from shadernn_tpu.engine.streaming import StreamingEngine
    from shadernn_tpu.models import build_model
    from shadernn_tpu.utils.trace_profile import parse_trace_dir

    g = build_model("yolov3-tiny")
    eng = snn.Engine.from_graph(
        g, snn.EngineOptions(precision=snn.Precision.BF16, batch_size=batch)
    )
    (in_name,) = g.input_names
    spec = g.nodes[in_name].out_spec.shape
    rng = np.random.default_rng(0)
    frame = rng.random(tuple(spec[1:]), dtype=np.float32)
    # warm up the compiled step before the timed stream — and BLOCK on the
    # result: async dispatch alone would let the first executable load
    # land inside the timed window
    jax.block_until_ready(
        eng.model({in_name: np.broadcast_to(frame, (batch, *spec[1:])).copy()})
    )
    log("stream warmup done")
    # Pass 1 (untraced): wall-side serving numbers. Fixed frame budget and
    # a hard deadline: the remote tunnel's bandwidth intermittently
    # collapses by ~100x for minutes at a time (single-op stalls of
    # 60-500 s measured even for sequential main-thread dispatch+fetch,
    # no threading involved), and an unbounded producer would let one bad
    # phase consume the whole bench. If the deadline trips, we snapshot
    # the stats so the degraded wall number is still reported honestly.
    def _run_window(inflight: int, n_batches: int, deadline_s: float):
        """One stream window: queue is PRE-FILLED before the dispatcher
        starts (pure full batches, no producer pacing in the number),
        hard-stopped on the deadline so an abandoned dispatcher never
        overlaps the next window or the traced pass (ADVICE r4 medium).
        Returns (stats, completed)."""
        s = StreamingEngine(eng, max_inflight=inflight)
        for i in range(n_batches * batch):
            s.submit(0, i, frame)
        s.queue.close()
        s.start()
        d = threading.Event()

        def _joiner():
            s.stop(drain=True)
            d.set()

        threading.Thread(target=_joiner, daemon=True).start()
        completed = d.wait(timeout=deadline_s)
        if not completed:
            log(f"stream window (inflight={inflight}) hit the "
                "tunnel-weather deadline; hard-stopping")
            s._stop.set()  # dispatcher polls _stop within 0.25 s
            t = s._thread
            if t is not None:
                t.join(timeout=30.0)
        return s.stats(), completed

    # Overlap A/B (VERDICT r4 weak #4): ALTERNATE serialized-window
    # (max_inflight=1) and overlapped windows so tunnel-weather drift
    # hits both sides; the median of per-pair gains is the reported
    # overlap win (a single serial-then-overlap pair measured both >1.2x
    # and <0.7x purely on weather).
    deadline = max(seconds * 20, 60.0)
    _run_window(4, 2, deadline)  # warmup (first-dispatch costs)
    pair_gains = []
    serial_fps_all, overlap_stats = [], []
    for _ in range(3):
        st_s, ok_s = _run_window(1, 4, deadline)
        st_o, ok_o = _run_window(4, 4, deadline)
        if (ok_s and ok_o and st_s["throughput_fps"]
                and st_o["throughput_fps"]):
            # deadline-tripped windows carry deflated partial rates —
            # only completed pairs enter the A/B
            pair_gains.append(
                st_o["throughput_fps"] / st_s["throughput_fps"])
            serial_fps_all.append(st_s["throughput_fps"])
        if ok_o and st_o["frames_done"]:
            overlap_stats.append(st_o)
    if not overlap_stats:  # all windows tripped: report the last anyway
        overlap_stats = [st_o]
    serial_fps = float(np.median(serial_fps_all)) if serial_fps_all else 0.0
    # report wall-side numbers from the overlapped windows combined
    frames_done = sum(s["frames_done"] for s in overlap_stats)
    wall_s = sum(
        s["frames_done"] / s["throughput_fps"]
        for s in overlap_stats if s["throughput_fps"]
    )
    lat = [s.get("p50_latency_ms", 0.0) for s in overlap_stats]
    st = {
        "throughput_fps": frames_done / wall_s if wall_s else 0.0,
        "frames_done": frames_done,
        "batches_run": sum(s["batches_run"] for s in overlap_stats),
        "mean_fetch_ms": float(np.mean(
            [s["mean_fetch_ms"] for s in overlap_stats])),
        "avg_fill": float(np.mean([s["avg_fill"] for s in overlap_stats])),
        "p50_latency_ms": float(np.median(lat)),
        "p99_latency_ms": max(
            s.get("p99_latency_ms", 0.0) for s in overlap_stats),
    }
    log(f"stream A/B windows done: serial~{serial_fps:.1f} fps, "
        f"pair gains {[round(g, 3) for g in pair_gains]}, overlap {st}")
    # Pass 2 (traced, short): device-side step time of the streamed
    # batches. Kept separate because profiling over the remote tunnel
    # adds large per-dispatch overhead that would poison the wall numbers.
    trace_dir = tempfile.mkdtemp(prefix="snn_stream_trace_")
    tstream = StreamingEngine(eng).start()
    jax.profiler.start_trace(trace_dir)
    tdone = threading.Event()

    def _traced_pass():
        for i in range(3 * batch):
            tstream.submit(0, i, frame)
        tstream.stop(drain=True)
        tdone.set()

    threading.Thread(target=_traced_pass, daemon=True).start()
    tdone.wait(timeout=120.0)
    jax.profiler.stop_trace()
    tst = tstream.stats()
    out = {
        "yolo_stream_fps": round(st["throughput_fps"], 1),
        "yolo_stream_p50_ms": round(st.get("p50_latency_ms", 0.0), 3),
        "yolo_stream_p99_ms": round(st.get("p99_latency_ms", 0.0), 3),
        "yolo_stream_frames": st["frames_done"],
        "yolo_stream_avg_fill": round(st["avg_fill"], 2),
        "yolo_stream_fetch_sum_ms": round(
            st["mean_fetch_ms"] * st["batches_run"], 1),
        # alternated serialized-vs-overlapped window A/B: median of
        # per-pair gains (robust to tunnel-weather drift between windows)
        "yolo_stream_serial_window_fps": round(serial_fps, 1),
        "yolo_stream_overlap_gain_vs_serial": round(
            float(np.median(pair_gains)), 3) if pair_gains else 0.0,
        "yolo_stream_overlap_pair_gains": [
            round(g, 3) for g in pair_gains],
        "yolo_stream_note": (
            "wall numbers include the remote-tunnel host<->device RTT "
            "(overlapped across batches); device_* rows are the on-device "
            "step time of the same streamed batches, from the trace"
        ),
    }
    try:
        rep = parse_trace_dir(trace_dir, steps=max(tst["batches_run"], 1),
                              precision="bfloat16")
        step_ms = rep.e2e_us / 1e3
        if step_ms > 0:
            out["yolo_stream_device_step_ms"] = round(step_ms, 4)
            out["yolo_stream_device_p50_ms_per_frame"] = round(
                step_ms / batch, 4)
            out["yolo_stream_device_steps_per_sec"] = round(1e3 / step_ms, 1)
            out["yolo_stream_device_fps"] = round(batch * 1e3 / step_ms, 1)
            # Overlap evidence (VERDICT r4 weak #4): a serial schedule's
            # wall >= sum(blocking fetches) + sum(device steps) by
            # construction; with dispatch/fetch overlapped the wall can
            # drop BELOW that sum. Ratio > 1 quantifies the hidden work —
            # on-chip, not a stub.
            wall_s = st["frames_done"] / max(st["throughput_fps"], 1e-9)
            serial_s = (
                st["mean_fetch_ms"] * st["batches_run"]
                + step_ms * st["batches_run"]
            ) / 1e3
            out["yolo_stream_overlap_evidence"] = round(
                serial_s / max(wall_s, 1e-9), 3
            )
    except Exception as e:
        log(f"stream trace parse failed: {type(e).__name__}: {e}")
    log(f"yolo stream: {out}")
    return out


STREAM_OVERLAP_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, shadernn_tpu as snn
from shadernn_tpu.engine.streaming import StreamingEngine
from shadernn_tpu.models import build_model
g = build_model("espcn", h=128, w=192)
eng = snn.Engine.from_graph(g, snn.EngineOptions(
    precision=snn.Precision.FP32, batch_size=4))
frame = np.random.default_rng(0).random((128, 192, 1), np.float32)
jax.block_until_ready(eng.model({{"input": np.broadcast_to(
    frame, (4, 128, 192, 1)).copy()}}))
for tag, inflight in (("overlap", 4), ("serial", 1)):
    s = StreamingEngine(eng, max_inflight=inflight).start()
    for i in range(64):
        s.submit(0, i, frame)
    s.stop(drain=True)
    st = s.stats()
    print(tag.upper(), round(st["throughput_fps"], 1),
          round(st["mean_fetch_ms"], 3))
"""


def _stream_overlap_local(log) -> dict:
    """Stream the same frames with the in-flight window at 4 vs 1 on a
    LOCAL device (CPU backend, no tunnel RTT). With near-zero fetch
    latency there is nothing for the window to hide, so gain ~1.0 here is
    the expected result — the number pins the window's overhead floor
    (the on-chip overlap win is yolo_stream_overlap_evidence, where the
    fetches are real)."""
    import subprocess

    code = STREAM_OVERLAP_SNIPPET.format(repo=_REPO)
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=900,
                           capture_output=True, text=True)
        vals = {}
        for line in r.stdout.splitlines():
            parts = line.split()
            if parts and parts[0] in ("OVERLAP", "SERIAL"):
                vals[parts[0].lower()] = (float(parts[1]), float(parts[2]))
        if "overlap" in vals and "serial" in vals:
            out = {
                "stream_local_overlap_fps": vals["overlap"][0],
                "stream_local_serial_fps": vals["serial"][0],
                "stream_local_overlap_gain": round(
                    vals["overlap"][0] / max(vals["serial"][0], 1e-9), 3),
            }
            log(f"local stream overlap A/B: {out}")
            return out
        log(f"stream overlap subprocess gave no result: {r.stderr[-300:]}")
    except Exception as e:
        log(f"stream overlap subprocess failed: {e}")
    return {}


AOT_LOAD_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
from shadernn_tpu.utils import enable_compile_cache
enable_compile_cache({cache!r})
import numpy as np
t0 = time.time()
from shadernn_tpu.engine.deploy import ExportedEngine
eng = ExportedEngine({path!r})
(in_name,) = list(eng.meta["inputs"])
shape = eng.meta["inputs"][in_name]
x = np.zeros(shape, np.float32)
y = eng.run_single(x)
np.asarray(y)
print("AOT_LOAD_S", round(time.time() - t0, 1))
"""


def _aot_bench(batch: int, log) -> dict:
    """Cold-start serving via AOT (VERDICT r3 #9): export the compiled
    MobileNetV2 engine (StableHLO + weights, engine/deploy.py), then load
    and run it in a FRESH process with no model-building code. The
    serialized program compiles through the persistent cache (its HLO is
    deterministic), so the load cost is deserialize + cache-hit + first
    execution — the analog of the reference's one-time model-load path
    (SURVEY §3.1)."""
    import subprocess
    import tempfile

    import shadernn_tpu as snn
    from shadernn_tpu.engine.deploy import export_engine
    from shadernn_tpu.models import build_model

    eng = snn.Engine.from_graph(
        build_model("mobilenetv2"),
        snn.EngineOptions(precision=snn.Precision.BF16, batch_size=batch),
    )
    path = tempfile.mkdtemp(prefix="snn_aot_")
    export_engine(eng, path)
    # prime: one in-process load compiles the exported program and lands
    # it in the persistent cache (the deploy step of a serving fleet)
    from shadernn_tpu.engine.deploy import ExportedEngine

    pre = ExportedEngine(path)
    np.asarray(pre.run_single(np.zeros(pre.meta["inputs"][
        list(pre.meta["inputs"])[0]], np.float32)))
    code = AOT_LOAD_SNIPPET.format(
        repo=_REPO, cache=os.path.join(_REPO, ".jax_cache"), path=path)
    r = subprocess.run([sys.executable, "-c", code], timeout=900,
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("AOT_LOAD_S"):
            out = {"aot_load_s": float(line.split()[1])}
            log(f"aot cold start: {out}")
            return out
    log(f"aot load subprocess gave no result: {r.stderr[-300:]}")
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="espcn")
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16", "int8"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--inner_loops", type=int, default=30)
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--protocol", default="trace", choices=["trace", "loop"])
    ap.add_argument("--output_dtype", default="activation",
                    choices=["activation", "float32"],
                    help="headline output dtype; 'activation' hands back the "
                    "compute dtype like the reference hands fp16 textures "
                    "(imageTexture.h:31), skipping the f32 upcast+copy of "
                    "the full-size output")
    ap.add_argument("--skip_secondary", action="store_true",
                    help="headline model only (skip mobilenetv2-int8)")
    ap.add_argument("--all", action="store_true",
                    help="(kept for compatibility; the zoo runs by default)")
    ap.add_argument("--skip_zoo", action="store_true",
                    help="skip the full-zoo sweep (headliners only)")
    args = ap.parse_args()

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    import logging

    logging.disable(logging.INFO)  # keep stdout to the single JSON line

    extra = {}
    if not args.skip_zoo and not args.skip_secondary:
        # Full-zoo coverage (VERDICT r2 #4), default-on so the driver's
        # plain `python bench.py` captures every BASELINE config's
        # frames/s, not just the two headliners.
        from shadernn_tpu.models import list_models

        zoo = {}
        for name in list_models():
            if name.startswith("styletransfer-"):
                # per-style weight variants share the styletransfer
                # architecture: perf is identical, skip the recompiles
                log(f"{name}: skipped (same architecture as styletransfer)")
                continue
            kw = {}
            if name == "unet":
                kw = {"base_filters": 32}
            try:
                zstats = bench_model(
                    name, args.precision, args.batch, args.inner_loops,
                    log, args.backend, args.protocol, **kw)
                zoo[name] = {
                    "fps": round(zstats["frames_per_sec"], 1),
                    "p50_ms_per_frame": round(
                        zstats.get("p50_ms_per_frame",
                                   zstats["mean_ms"] / args.batch), 4),
                }
            except Exception as e:  # keep going; report the failure
                log(f"{name}: FAILED {type(e).__name__}: {e}")
                zoo[name] = {"error": f"{type(e).__name__}: {e}"}
        # BASELINE configs[1]: StyleTransfer at 512x512 (the zoo row above
        # is the reference's 224 config; the baseline names 512). The
        # candy variant loads the TRAINED 512^2 per-style artifact when
        # present (models/zoo.py), so this row runs real weights.
        try:
            sstats = bench_model(
                "styletransfer-candy", args.precision, args.batch,
                args.inner_loops, log, args.backend, args.protocol,
                h=512, w=512)
            zoo["styletransfer_512"] = {
                "fps": round(sstats["frames_per_sec"], 1),
                "p50_ms_per_frame": round(
                    sstats.get("p50_ms_per_frame",
                               sstats["mean_ms"] / args.batch), 4),
            }
        except Exception as e:
            log(f"styletransfer_512: FAILED {type(e).__name__}: {e}")
            zoo["styletransfer_512"] = {"error": f"{type(e).__name__}: {e}"}
        extra["zoo"] = zoo

    # Secondary headline: MobileNetV2 INT8 (BASELINE.md metric row 2).
    if not args.skip_secondary and args.model == "espcn":
        try:
            mstats = bench_model("mobilenetv2", "int8", args.batch,
                                 args.inner_loops, log, args.backend,
                                 args.protocol)
            extra["mobilenetv2_int8_frames_per_sec_per_chip"] = round(
                mstats["frames_per_sec"], 1)
            extra["mobilenetv2_int8_p50_ms_per_frame"] = round(
                mstats.get("p50_ms_per_frame",
                           mstats["mean_ms"] / args.batch), 4)
            extra["mobilenetv2_compile_s"] = mstats["compile_s"]
            extra.update(_block_roofline(mstats, log, args.batch))
            # Throughput-batch row (VERDICT r4 #4): XLA lays the early
            # 224^2 convs out batch-minor (batch fills LANES), so b8
            # uses 8/128 lanes there; serving at b64 fills them and
            # lifts frames/s/chip ~40% while p50-per-frame also drops.
            try:
                t64 = bench_model("mobilenetv2", "int8", 64,
                                  max(args.inner_loops // 2, 10), log,
                                  args.backend, args.protocol)
                extra["mobilenetv2_int8_b64_frames_per_sec_per_chip"] = round(
                    t64["frames_per_sec"], 1)
                extra["mobilenetv2_int8_b64_step_ms"] = round(
                    t64["mean_ms"], 3)
            except Exception as e:
                log(f"mobilenetv2 b64 FAILED {type(e).__name__}: {e}")
            # Prime-then-assert, both in FRESH processes (the product
            # path: one process deploys/compiles, every later serving
            # process hits the persistent cache). The long-running bench
            # parent keys slightly different HLO for the same model
            # (in-process Mosaic kernel-name counters after the zoo
            # sweep), so priming from a fresh subprocess — what a real
            # fleet's deploy step is — makes the asserted hit meaningful.
            w_prime = warm_compile_s("mobilenetv2", "INT8", args.batch, log)
            log(f"warm compile prime: {w_prime}")
            w = warm_compile_s("mobilenetv2", "INT8", args.batch, log)
            if w.get("warm_compile_s", -1) > 0:
                extra["mobilenetv2_warm_compile_s"] = w["warm_compile_s"]
                extra["mobilenetv2_warm_cache_hits"] = w.get("cache_hits", 0)
                extra["mobilenetv2_warm_cache_misses"] = w.get(
                    "cache_misses", 0)
                extra["mobilenetv2_warm_cache_retrieval_s"] = w.get(
                    "cache_retrieval_s", 0.0)
                # the asserted cache story: every compile request in the
                # warm process was served from the persistent cache
                extra["compile_cache_hit"] = bool(
                    w.get("cache_hits", 0) > 0
                    and w.get("cache_misses", 0) == 0
                )
                log(f"warm compile split: {w}")
        except Exception as e:
            log(f"mobilenetv2 secondary FAILED {type(e).__name__}: {e}")
        try:
            extra.update(_aot_bench(args.batch, log))
        except Exception as e:
            log(f"aot bench FAILED {type(e).__name__}: {e}")
        try:
            extra.update(_a8w8_bench(args.batch, args.inner_loops, log))
        except Exception as e:
            log(f"a8w8 FAILED {type(e).__name__}: {e}")
        try:
            extra.update(
                _a8w8_bench(args.batch, args.inner_loops, log, model="resnet18")
            )
        except Exception as e:
            log(f"resnet18 a8w8 FAILED {type(e).__name__}: {e}")
        try:
            extra.update(_chain_int8_bench(args.batch, args.inner_loops, log))
        except Exception as e:
            log(f"chain int8 A/B FAILED {type(e).__name__}: {e}")
        try:
            extra.update(_stream_bench(args.batch, log))
        except Exception as e:
            log(f"yolo stream FAILED {type(e).__name__}: {e}")
        try:
            extra.update(_stream_overlap_local(log))
        except Exception as e:
            log(f"stream overlap A/B FAILED {type(e).__name__}: {e}")
        try:
            extra.update(_prod_shape_validation(log))
        except Exception as e:
            log(f"prod-shape validation FAILED {type(e).__name__}: {e}")

    # Headline: ESPCN 540p, per-chip frames/s.
    stats = bench_model(
        args.model, args.precision, args.batch, args.inner_loops, log,
        args.backend, args.protocol, output_dtype=args.output_dtype,
    )
    fps = stats["frames_per_sec"]
    extra["output_dtype"] = args.output_dtype
    extra.update(_chain_roofline(stats, log, args.batch))
    extra["p50_ms_per_frame"] = round(
        stats.get("p50_ms_per_frame", stats["mean_ms"] / args.batch), 4)
    extra["compile_s"] = stats["compile_s"]
    extra["protocol"] = stats.get("protocol", "loop")
    record = {
        "metric": f"{args.model}_{args.precision}_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / (1e3 / REFERENCE_ESPCN_MS), 1),
        "extra": extra,
    }
    # Full detail goes to an artifact + an EARLIER stdout line; the FINAL
    # line stays compact so the driver's tail capture parses it (VERDICT
    # r4 #7: BENCH_r04 overflowed the tail and landed `parsed: null`).
    with open(os.path.join(_REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)
    headline_keys = (
        "p50_ms_per_frame", "compile_s", "protocol", "output_dtype",
        "chain_kernel_pct_of_bound", "chain_kernel_roofline_pct",
        "chain_int8_frames_per_sec", "chain_int8_pct_of_bound",
        "mobilenetv2_int8_frames_per_sec_per_chip",
        "block_kernels_pct_of_bound", "aot_load_s", "compile_cache_hit",
    )
    compact = {k: extra[k] for k in headline_keys if k in extra}
    compact["detail"] = "BENCH_DETAIL.json"
    print(
        json.dumps(
            {
                "metric": record["metric"],
                "value": record["value"],
                "unit": record["unit"],
                "vs_baseline": record["vs_baseline"],
                "extra": compact,
            }
        )
    )


if __name__ == "__main__":
    main()
