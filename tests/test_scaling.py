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
