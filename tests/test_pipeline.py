"""Pipeline-parallel inference tests on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.models import build_model
from shadernn_tpu.parallel.pipeline import PipelinedEngine, split_stages

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_split_stages_balanced_and_complete():
    g = build_model("resnet18")
    stages = split_stages(g, 4)
    assert len(stages) == 4
    all_nodes = [n.name for s in stages for n in s.nodes]
    assert len(all_nodes) == len(set(all_nodes)) == len(g.nodes) - 1
    # final stage must produce the graph output
    assert g.output_names[0] in stages[-1].produces
    # rough balance: no stage owns more than 70% of flops
    total = sum(s.flops for s in stages)
    assert max(s.flops for s in stages) < 0.7 * total


@pytest.mark.parametrize("model,kwargs,num_stages", [
    ("espcn", {"h": 16, "w": 24}, 4),
    ("resnet18", {}, 4),
    ("styletransfer", {"h": 32, "w": 32, "num_res_blocks": 2}, 8),
])
def test_pipeline_matches_single_device(rng, model, kwargs, num_stages):
    g = build_model(model, **kwargs)
    spec = g.nodes[g.input_names[0]].out_spec
    batch = 4
    x = rng.random((batch, *spec.shape[1:]), dtype=np.float32)

    single = compile_graph(build_model(model, **kwargs), EngineOptions(batch_size=batch))
    want = np.asarray(single.run_single(x))

    pipe = PipelinedEngine(
        build_model(model, **kwargs), EngineOptions(), num_stages=num_stages,
        micro_batch=2,
    )
    assert len(set(pipe.stage_devices())) == num_stages  # distinct devices
    got = np.asarray(pipe.run({g.input_names[0]: x})[g.output_names[0]])
    oracle.compare(got, want, 1e-4, f"pipeline-{model}")


def test_pipeline_skip_connections(rng):
    """U-Net's long skip concats cross stage boundaries."""
    g = build_model("unet", h=32, w=32, base_filters=4, depth=2)
    x = rng.random((2, 32, 32, 1), dtype=np.float32)
    single = compile_graph(
        build_model("unet", h=32, w=32, base_filters=4, depth=2),
        EngineOptions(batch_size=2),
    )
    want = np.asarray(single.run_single(x))
    pipe = PipelinedEngine(
        build_model("unet", h=32, w=32, base_filters=4, depth=2),
        EngineOptions(), num_stages=4, micro_batch=1,
    )
    got = np.asarray(pipe.run({"input": x})["head"])
    oracle.compare(got, want, 1e-4, "pipeline-unet-skips")


def test_pipeline_dp_submesh(rng):
    """PP x DP: 4 stages, each a 2-device 'data' sub-mesh. Params are
    replicated within a stage group, micro-batches batch-shard over it,
    and inter-stage transfers reshard onto the next group's sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = jax.devices()[:8]
    groups = [devs[0:2], devs[2:4], devs[4:6], devs[6:8]]
    g = build_model("espcn", h=16, w=24)
    batch = 8
    x = rng.random((batch, 16, 24, 1), dtype=np.float32)

    single = compile_graph(build_model("espcn", h=16, w=24),
                           EngineOptions(batch_size=batch))
    want = np.asarray(single.run_single(x))

    pipe = PipelinedEngine(
        build_model("espcn", h=16, w=24), EngineOptions(),
        devices=groups, micro_batch=2,
    )
    # every stage got a 2-device sub-mesh with axis 'data'
    assert all(s.mesh is not None and s.mesh.size == 2 for s in pipe.stages)
    # params replicated within the group, inputs batch-sharded over it
    s0 = pipe.stages[0]
    p = next(iter(next(iter(s0.params.values())).values()))
    assert p.sharding == NamedSharding(s0.mesh, P())
    got = np.asarray(pipe.run({g.input_names[0]: x})[g.output_names[0]])
    oracle.compare(got, want, 1e-4, "pipeline-dp-submesh")


def test_pipeline_throughput_stats(rng):
    """Overlap metric exists and is self-consistent (W7: overlap was never
    measured). CPU timings are noisy, so assert structure + sanity, not
    absolute speedups."""
    eng = PipelinedEngine(
        build_model("espcn", h=32, w=48), EngineOptions(), num_stages=2,
        micro_batch=2,
    )
    x = rng.random((8, 32, 48, 1), dtype=np.float32)
    stats = eng.throughput_stats({"input": x}, iters=2)
    assert stats["stages"] == 2 and stats["micro_batches"] == 4
    assert stats["pipelined_s"] > 0 and stats["serial_s"] > 0
    assert 0 < stats["bubble_fraction_model"] < 1
    # pipelined must not be slower than fully-serial by more than noise
    assert stats["speedup"] > 0.5, stats
