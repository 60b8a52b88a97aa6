"""Elastic recovery tests: injected device failures shrink the mesh and
replay the batch (the failure-detection subsystem the reference lacks)."""

import numpy as np
import pytest
import jax

from shadernn_tpu.config import EngineOptions, ShardingOptions
from shadernn_tpu.models import build_model
from shadernn_tpu.parallel.elastic import ElasticEngine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)


def _make(data=4, batch=4):
    return ElasticEngine(
        lambda: build_model("espcn", h=16, w=24),
        EngineOptions(
            batch_size=batch, sharding=ShardingOptions(data=data)
        ),
    )


def _out_name(ee):
    return ee.engine.graph.output_names[0]


def test_normal_operation():
    ee = _make()
    x = np.random.default_rng(0).random((4, 16, 24, 1), dtype=np.float32)
    out_name = _out_name(ee)
    out = ee.run({"input": x})
    assert np.asarray(out[out_name]).shape == (4, 32, 48, 1)
    assert ee.failures == 0 and ee.data_parallel_degree == 4


def test_failure_shrinks_and_recovers(rng):
    ee = _make()
    x = rng.random((4, 16, 24, 1), dtype=np.float32)
    out_name = _out_name(ee)
    want = np.asarray(ee.run({"input": x})[out_name])

    ee.inject_failure(1)
    out = ee.run({"input": x})
    assert ee.failures == 1 and ee.rebuilds == 1
    assert ee.data_parallel_degree == 2  # halved
    got = np.asarray(out[out_name]) if not isinstance(out[out_name], np.ndarray) else out[out_name]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_double_failure_then_single_device(rng):
    ee = _make()
    x = rng.random((4, 16, 24, 1), dtype=np.float32)
    out_name = _out_name(ee)
    want = np.asarray(ee.run({"input": x})[out_name])
    ee.inject_failure(2)
    out = ee.run({"input": x})
    assert ee.data_parallel_degree == 1
    got = np.asarray(out[out_name]) if not isinstance(out[out_name], np.ndarray) else out[out_name]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_exhausted_rebuilds_raises(rng):
    ee = ElasticEngine(
        lambda: build_model("espcn", h=16, w=24),
        EngineOptions(batch_size=2, sharding=ShardingOptions(data=2)),
        max_rebuilds=1,
    )
    ee.inject_failure(5)
    with pytest.raises(RuntimeError):
        ee.run({"input": rng.random((2, 16, 24, 1), dtype=np.float32)})