"""Scaling benchmark harness: frames/s vs device count.

BASELINE.md's scaling target is linear frames/s from 1 chip -> 1 host ->
2 hosts on a v5e-16 slice. This harness runs the same engine step under
data-parallel sharding at increasing device counts and reports throughput
and efficiency. On CI it runs against the virtual CPU mesh (correctness +
plumbing); on a real slice the same code measures actual ICI/DCN scaling.

CLI:  python -m shadernn_tpu.parallel.scaling --model espcn --devices 1,2,4,8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List, Sequence

import numpy as np

from shadernn_tpu.config import BackendKind, EngineOptions, Precision, ShardingOptions
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.models import build_model
from shadernn_tpu.parallel.mesh import make_mesh


def measure_scaling(
    model_name: str = "espcn",
    device_counts: Sequence[int] = (1, 2, 4, 8),
    per_device_batch: int = 2,
    precision: Precision = Precision.BF16,
    backend: BackendKind = BackendKind.XLA,
    iters: int = 10,
    build_kwargs: dict | None = None,
) -> List[dict]:
    """Run the model DP-sharded over n devices for each n; returns one
    record per device count with throughput and parallel efficiency."""
    import jax

    build_kwargs = build_kwargs or {}
    results = []
    base_fps = None
    for n in device_counts:
        if n > len(jax.devices()):
            break
        batch = per_device_batch * n
        sharding = ShardingOptions(data=n)
        mesh = make_mesh(sharding) if n > 1 else None
        graph = build_model(model_name, **build_kwargs)
        options = EngineOptions(
            precision=precision, backend=backend, batch_size=batch,
            sharding=sharding,
        )
        eng = Engine.from_graph(graph, options, mesh=mesh)
        spec = graph.nodes[graph.input_names[0]].out_spec
        x = np.random.default_rng(0).random(
            (batch, *spec.shape[1:]), dtype=np.float32
        )
        stats = eng.device_benchmark({graph.input_names[0]: x}, iters=iters)
        fps = stats["frames_per_sec"]
        if base_fps is None:
            base_fps = fps
        results.append(
            {
                "devices": n,
                "batch": batch,
                "mean_ms": stats["mean_ms"],
                "frames_per_sec": fps,
                "speedup": fps / base_fps,
                "efficiency": fps / (base_fps * n),
            }
        )
    return results


def run_multihost_smoke(nproc: int = 2) -> int:
    """Spawn `nproc` CPU processes of the multihost worker (gloo
    collectives) and run the cross-host DP smoke — the CI form of the
    BASELINE 1->2 host scaling step. Returns a shell exit code."""
    import os
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "shadernn_tpu.parallel.multihost",
             str(pid), str(nproc), str(port)],
            env=env,
        )
        for pid in range(nproc)
    ]
    rc = max(p.wait() for p in procs)
    print(json.dumps({"multihost_smoke": "ok" if rc == 0 else "FAILED",
                      "processes": nproc}))
    return rc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="espcn")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16", "int8"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--multihost", action="store_true",
                    help="run the 2-process cross-host smoke instead")
    args = ap.parse_args(argv)
    if args.multihost:
        return run_multihost_smoke()
    prec = {"fp32": Precision.FP32, "bf16": Precision.BF16,
            "int8": Precision.INT8}[args.precision]
    counts = [int(x) for x in args.devices.split(",")]
    results = measure_scaling(
        args.model, counts, args.per_device_batch, prec, iters=args.iters
    )
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    sys.exit(main())
