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
