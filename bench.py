#!/usr/bin/env python
"""Benchmark CLI. Prints ONE JSON line for the driver:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: ESPCN 2x 540p frames/sec/chip (BASELINE.json configs[0]).
vs_baseline compares against the reference's only published figure: 775.194
ms per ESPCN_2X inference on its target phone GPU
(docs/Developer-Guide/Benchmarking.md:25-45) = 1.29 frames/s.

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
# seconds instead of minutes on repeat runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

REFERENCE_ESPCN_MS = 775.194  # docs/Developer-Guide/Benchmarking.md:25


def bench_model(name: str, precision: str, batch: int, loops: int, log,
                backend_name: str = "auto", **build_kwargs):
    import shadernn_tpu as snn
    from shadernn_tpu.models import build_model

    prec = {"fp32": snn.Precision.FP32, "bf16": snn.Precision.BF16,
            "int8": snn.Precision.INT8}[precision]
    backend = {"auto": snn.BackendKind.AUTO, "xla": snn.BackendKind.XLA,
               "pallas": snn.BackendKind.PALLAS}[backend_name]
    graph = build_model(name, **build_kwargs)
    t0 = time.time()
    eng = snn.Engine.from_graph(
        graph, snn.EngineOptions(precision=prec, batch_size=batch, backend=backend)
    )
    in_spec = graph.nodes[graph.input_names[0]].out_spec.shape
    x = np.random.default_rng(0).random((batch, *in_spec[1:]), dtype=np.float32)
    # Device-loop timing: host wall-clock is unreliable over remote-tunnel
    # PJRT (block_until_ready returns early; fetches are link-bound), so
    # time `loops` chained forward passes on device and fetch one scalar.
    stats = eng.device_benchmark({graph.input_names[0]: x}, iters=loops)
    stats["compile_s"] = round(time.time() - t0 - stats["mean_ms"] * loops / 1e3, 1)
    log(f"{name} {precision} b{batch}: {stats}")
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="espcn")
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16", "int8"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--inner_loops", type=int, default=30)
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
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
                bench_model(name, args.precision, args.batch, args.inner_loops, log, args.backend, **kw)
            except Exception as e:  # keep going; report the failure
                log(f"{name}: FAILED {type(e).__name__}: {e}")

    # Headline: ESPCN 540p, per-chip frames/s.
    stats = bench_model(
        args.model, args.precision, args.batch, args.inner_loops, log, args.backend
    )
    fps = stats["frames_per_sec"]
    print(
        json.dumps(
            {
                "metric": f"{args.model}_{args.precision}_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / (1e3 / REFERENCE_ESPCN_MS), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
