"""Scaling harness plumbing test (virtual CPU mesh — verifies sharded
engines produce correct throughput records; real efficiency numbers only
mean something on hardware)."""

import jax
import pytest

from shadernn_tpu.parallel.scaling import measure_scaling

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


def test_measure_scaling_records():
    results = measure_scaling(
        "espcn", (1, 2, 4), per_device_batch=1, iters=2,
        build_kwargs={"h": 16, "w": 24},
    )
    assert [r["devices"] for r in results] == [1, 2, 4]
    assert all(r["frames_per_sec"] > 0 for r in results)
    assert results[0]["speedup"] == 1.0
    assert all(r["batch"] == r["devices"] for r in results)


def test_scaling_is_not_serialized():
    """Efficiency property, not just plumbing: on the virtual mesh a DP
    sharding that silently serialized (all frames through one device's
    program, or a gather-per-layer plan) would show throughput FALLING
    with device count. Assert 4-dev aggregate throughput at least matches
    1-dev (true even on CPU, where virtual devices share cores — per-
    device work is constant and XLA partitions genuinely execute)."""
    results = measure_scaling(
        "espcn", (1, 4), per_device_batch=2, iters=4,
        build_kwargs={"h": 32, "w": 32},
    )
    fps1 = results[0]["frames_per_sec"]
    fps4 = results[1]["frames_per_sec"]
    assert fps4 >= 0.9 * fps1, (fps1, fps4)


def test_dp_output_is_genuinely_sharded():
    """Deterministic (non-timing) evidence the DP plan partitions work
    (ADVICE r4 / r4 weak #7: the wall-clock bar is soft on a shared-core
    virtual mesh): the 4-device engine's outputs must come back sharded
    over all 4 devices with per-device shards of batch/4 — a serialized
    or replicated plan cannot produce that."""
    import numpy as np

    from shadernn_tpu.config import EngineOptions, Precision, ShardingOptions
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models import build_model
    from shadernn_tpu.parallel.mesh import make_mesh

    sharding = ShardingOptions(data=4)
    graph = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(
        graph,
        EngineOptions(precision=Precision.BF16, batch_size=8,
                      sharding=sharding),
        mesh=make_mesh(sharding),
    )
    x = np.random.default_rng(0).random((8, 16, 24, 1), dtype=np.float32)
    y = eng.model({graph.input_names[0]: x})
    out = y[graph.output_names[0]]
    assert len(out.sharding.device_set) == 4, out.sharding
    shard_batches = {s.data.shape[0] for s in out.addressable_shards}
    assert shard_batches == {2}, shard_batches  # batch 8 / 4 devices
