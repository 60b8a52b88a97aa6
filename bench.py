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
    return stats


def _chain_roofline(stats, log) -> dict:
    """Measured roofline fractions for the Pallas chain kernels, true-FLOP
    accounting (BASELINE.md >=80% gate; see DEVNOTES.md for the bound
    analysis). Uses XLA's in-situ custom-call timings from the trace."""
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
    tflops = conv_flops / (k_us * 1e-6) / 1e12 if k_us else 0.0
    frac = tflops * 1e12 / PEAK_FLOPS.get(report.precision,
                                          PEAK_FLOPS["bfloat16"])
    # memory side: bytes in+out of the kernels per step
    k_bytes = sum(o.bytes_accessed for o in kernels)
    gbs = k_bytes / (k_us * 1e-6) / 1e9 if k_us else 0.0
    out = {
        "chain_kernel_ms": round(k_us / 1e3, 4),
        "chain_kernel_tflops_true": round(tflops, 2),
        "chain_kernel_roofline_pct": round(100 * max(frac, gbs / PEAK_HBM_GBS), 1),
    }
    log(f"chain kernel roofline: {out}")
    return out


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
    ap.add_argument("--all", action="store_true", help="bench every zoo model (extra lines to stderr)")
    args = ap.parse_args()

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    import logging

    logging.disable(logging.INFO)  # keep stdout to the single JSON line

    if args.all:
        from shadernn_tpu.models import list_models

        for name in list_models():
            kw = {}
            if name == "unet":
                kw = {"base_filters": 32}
            try:
                bench_model(name, args.precision, args.batch, args.inner_loops,
                            log, args.backend, args.protocol, **kw)
            except Exception as e:  # keep going; report the failure
                log(f"{name}: FAILED {type(e).__name__}: {e}")

    extra = {}
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
        except Exception as e:
            log(f"mobilenetv2 secondary FAILED {type(e).__name__}: {e}")

    # Headline: ESPCN 540p, per-chip frames/s.
    stats = bench_model(
        args.model, args.precision, args.batch, args.inner_loops, log,
        args.backend, args.protocol, output_dtype=args.output_dtype,
    )
    fps = stats["frames_per_sec"]
    extra["output_dtype"] = args.output_dtype
    extra.update(_chain_roofline(stats, log))
    extra["p50_ms_per_frame"] = round(
        stats.get("p50_ms_per_frame", stats["mean_ms"] / args.batch), 4)
    extra["compile_s"] = stats["compile_s"]
    extra["protocol"] = stats.get("protocol", "loop")
    print(
        json.dumps(
            {
                "metric": f"{args.model}_{args.precision}_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / (1e3 / REFERENCE_ESPCN_MS), 1),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
