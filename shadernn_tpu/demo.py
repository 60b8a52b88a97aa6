"""Demo / test CLI — the reference's test-binary flag surface as one tool.

The reference ships per-model CLI test binaries with CLI11 flags
(demo/test/unittest/inferenceProcessorTest.cpp:95-106: --use_vulkan
--use_compute --use_half --dump_outputs --inner_loops ...). Equivalent:

  python -m shadernn_tpu.demo run espcn --image cat.png --precision bf16
  python -m shadernn_tpu.demo run resnet18 --inner-loops 50 --backend pallas
  python -m shadernn_tpu.demo profile espcn
  python -m shadernn_tpu.demo stream espcn --frames 64 --batch 8
  python -m shadernn_tpu.demo serve espcn --batch 8     # AOT product path
  python -m shadernn_tpu.demo list
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from shadernn_tpu.config import BackendKind, Precision


def _common(ap):
    ap.add_argument("model", help="runner name (see `list`)")
    ap.add_argument("--image", default=None, help="input image (PNG/JPEG)")
    ap.add_argument("--precision", default="bf16", choices=["fp32", "bf16", "int8"])
    ap.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--inner-loops", type=int, default=10)
    ap.add_argument("--dump-outputs", action="store_true")
    ap.add_argument("--dump-dir", default="layer_dumps")


def _opts(args):
    return (
        {"fp32": Precision.FP32, "bf16": Precision.BF16, "int8": Precision.INT8}[args.precision],
        {"auto": BackendKind.AUTO, "xla": BackendKind.XLA, "pallas": BackendKind.PALLAS}[args.backend],
    )


def cmd_run(args):
    from shadernn_tpu.models.runners import run_model

    precision, backend = _opts(args)
    result = run_model(
        args.model,
        image_path=args.image,
        precision=precision,
        backend=backend,
        batch_size=args.batch,
        inner_loops=args.inner_loops,
        dump_dir=args.dump_dir if args.dump_outputs else None,
    )
    stats = result["stats"]
    print(f"model: {args.model}  out: {result['output_shape']}")
    print(
        f"latency mean {stats['mean_ms']:.3f} ms  p50 {stats['p50_ms']:.3f} ms  "
        f"throughput {stats['frames_per_sec']:.1f} frames/s"
    )
    if "class_index" in result:
        print("class_index:", result["class_index"])
    if "detections" in result:
        print(f"detections ({len(result['detections'])}):")
        for d in result["detections"][:10]:
            print(f"  class {int(d[0])} score {d[1]:.3f} box "
                  f"[{d[2]:.3f}, {d[3]:.3f}, {d[4]:.3f}, {d[5]:.3f}]")
    if "dumps" in result:
        print(f"dumped {len(result['dumps'])} layer outputs to {args.dump_dir}/")


def cmd_profile(args):
    from shadernn_tpu.models.runners import RUNNERS, make_engine
    from shadernn_tpu.utils.profiler import print_report, profile_layers

    precision, backend = _opts(args)
    cfg = RUNNERS[args.model]
    eng = make_engine(args.model, precision, backend, args.batch)
    x = np.random.default_rng(0).random(
        (args.batch, cfg.height, cfg.width, cfg.channels), dtype=np.float32
    )
    profiles = profile_layers(eng, {eng.graph.input_names[0]: x}, iters=args.inner_loops)
    print(print_report(profiles, precision="bfloat16" if precision != Precision.FP32 else "float32"))


def cmd_stream(args):
    from shadernn_tpu.engine.streaming import StreamingEngine
    from shadernn_tpu.models.runners import RUNNERS, make_engine

    precision, backend = _opts(args)
    cfg = RUNNERS[args.model]
    eng = make_engine(args.model, precision, backend, args.batch)
    svc = StreamingEngine(eng).start()
    rng = np.random.default_rng(0)
    for i in range(args.frames):
        svc.submit(i % 4, i, rng.random(
            (cfg.height, cfg.width, cfg.channels), dtype=np.float32))
    svc.stop(drain=True)
    print(json.dumps(svc.stats(), indent=2))


def cmd_serve(args):
    """Production serving start: AOT by default (VERDICT r4 #8).

    First call exports the compiled engine (build + jit + serialize) to
    `--export-dir`; every later start loads the StableHLO artifact with NO
    model-building code and begins serving in seconds — the analog of the
    reference's one-time model-load compile story (SURVEY §3.1), made the
    default path rather than a bench row.
    """
    import os
    import time
    from types import SimpleNamespace

    from shadernn_tpu.engine.deploy import ExportedEngine, export_engine
    from shadernn_tpu.engine.streaming import StreamingEngine

    export_dir = args.export_dir or os.path.join(
        "serving_artifacts", f"{args.model}_{args.precision}_b{args.batch}"
    )
    t0 = time.time()
    if args.no_aot:
        # explicit opt-out: serve the jitted engine directly
        from shadernn_tpu.models.runners import make_engine

        precision, backend = _opts(args)
        eng = make_engine(args.model, precision, backend, args.batch)
        in_name = eng.graph.input_names[0]
        shape = eng.model.input_specs[in_name]
        import jax as _jax

        _jax.block_until_ready(
            eng.model({in_name: np.zeros(shape, np.float32)}))
        adapter = eng
    else:
        if not os.path.exists(os.path.join(export_dir, "step.stablehlo")):
            # one-time deploy step: build, compile, export
            from shadernn_tpu.models.runners import make_engine

            precision, backend = _opts(args)
            eng = make_engine(args.model, precision, backend, args.batch)
            export_engine(eng, export_dir)
            print(f"exported AOT artifact to {export_dir}/")
        exp = ExportedEngine(export_dir)
        (in_name,) = list(exp.meta["inputs"])
        shape = exp.meta["inputs"][in_name]
        # first execution compiles through the persistent cache
        # (deserialized StableHLO is deterministic) — block so the start
        # time is honest
        np.asarray(exp.run_single(np.zeros(shape, np.float32)))
        # continuous-batching service over the exported step:
        # StreamingEngine needs .model (callable), .options.batch_size,
        # .graph.input_names
        adapter = SimpleNamespace(
            model=exp,
            options=SimpleNamespace(batch_size=shape[0],
                                    auto_output_layout=False),
            graph=SimpleNamespace(input_names=[in_name]),
        )
    print(f"serving ready in {time.time() - t0:.1f}s "
          f"({'AOT' if not args.no_aot else 'JIT'}; model {args.model}, "
          f"batch {shape[0]})")
    svc = StreamingEngine(adapter).start()
    rng = np.random.default_rng(0)
    for i in range(args.frames):
        svc.submit(i % 4, i, rng.random(tuple(shape[1:]), dtype=np.float32))
    svc.stop(drain=True)
    print(json.dumps(svc.stats(), indent=2))


def cmd_list(_args):
    from shadernn_tpu.models.runners import RUNNERS

    for name, cfg in RUNNERS.items():
        print(f"  {name:<16} {cfg.model:<14} {cfg.height}x{cfg.width}x{cfg.channels} "
              f"({cfg.model_type})")


def main(argv=None):
    from shadernn_tpu.utils import enable_compile_cache

    enable_compile_cache()  # warm starts: 151.5s -> 5.4s on ESPCN
    ap = argparse.ArgumentParser(prog="shadernn_tpu.demo")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run a model once + benchmark")
    _common(p_run)
    p_run.set_defaults(fn=cmd_run)

    p_prof = sub.add_parser("profile", help="per-layer timing table")
    _common(p_prof)
    p_prof.set_defaults(fn=cmd_profile)

    p_stream = sub.add_parser("stream", help="continuous-batching throughput demo")
    _common(p_stream)
    p_stream.add_argument("--frames", type=int, default=64)
    p_stream.set_defaults(fn=cmd_stream)

    p_serve = sub.add_parser(
        "serve", help="start a serving loop (AOT artifact by default)")
    _common(p_serve)
    p_serve.add_argument("--frames", type=int, default=64)
    p_serve.add_argument("--export-dir", default=None,
                         help="AOT artifact dir (default: "
                         "serving_artifacts/<model>_<precision>_b<batch>)")
    p_serve.add_argument("--no-aot", action="store_true",
                         help="skip the AOT artifact and serve the jitted "
                         "engine directly")
    p_serve.set_defaults(fn=cmd_serve)

    p_list = sub.add_parser("list", help="list runners")
    p_list.set_defaults(fn=cmd_list)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
