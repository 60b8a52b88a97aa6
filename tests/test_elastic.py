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

def test_failed_device_excluded_from_rebuild(rng):
    """A failure blaming a device excludes it: rebuild never re-includes
    the dead chip and the DP degree fits the survivors (8 -> 7 -> dp 4)."""
    ee = ElasticEngine(
        lambda: build_model("espcn", h=16, w=24),
        EngineOptions(batch_size=8, sharding=ShardingOptions(data=8)),
    )
    dead = jax.devices()[3].id
    x = rng.random((8, 16, 24, 1), dtype=np.float32)
    out_name = _out_name(ee)
    want = np.asarray(ee.run({"input": x})[out_name])

    ee.inject_failure(1, device=dead)
    out = ee.run({"input": x})
    assert dead in ee.excluded_ids
    assert ee.data_parallel_degree == 4  # 7 survivors -> largest pow2
    # the rebuilt engine must not use the dead device
    used = {d.id for d in ee.healthy_devices()}
    assert dead not in used
    np.testing.assert_allclose(np.asarray(out[out_name]), want, atol=1e-4)
    # all 8 frames still processed (re-bucketed onto the smaller engine)
    assert np.asarray(out[out_name]).shape[0] == 8


def test_mark_failed_external_detector(rng):
    ee = _make()
    ee.mark_failed(jax.devices()[0].id)
    assert len(ee.healthy_devices()) == len(jax.devices()) - 1


def test_watchdog_times_out_hung_step(rng, monkeypatch):
    from shadernn_tpu.parallel.elastic import StepTimeout

    ee = _make(data=1, batch=2)
    ee.step_timeout_s = 0.05
    ee._max_rebuilds = 0  # surface the timeout instead of rebuilding

    class Hang:
        dtype = np.float32

        def block_until_ready(self):
            import time

            time.sleep(1.0)

    monkeypatch.setattr(ee.engine, "run", lambda inputs: {"y": Hang()})
    with pytest.raises(StepTimeout):
        ee.run({"input": np.zeros((2, 16, 24, 1), np.float32)})


def test_midstream_recovery_completes_workload(rng):
    """Stream 6 batches; a device dies mid-stream; every frame of the
    workload still comes back (on the shrunk mesh) and stays correct."""
    ee = _make()
    out_name = _out_name(ee)
    frames = rng.random((24, 16, 24, 1), dtype=np.float32)
    want = None
    got = []
    ee_ref = _make()  # failure-free reference engine
    ee.inject_failure(1, device=jax.devices()[1].id)  # dies on batch 0
    for start in range(0, 24, 4):
        chunk = frames[start : start + 4]
        got.append(np.asarray(ee.run({"input": chunk})[out_name]))
    got = np.concatenate(got)
    want = np.asarray(ee_ref.run({"input": frames})[out_name])
    assert got.shape == want.shape == (24, 32, 48, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert ee.rebuilds == 1 and jax.devices()[1].id in ee.excluded_ids


def test_timeout_recovery_probes_and_reaps_waiters(rng, monkeypatch):
    """A StepTimeout triggers cache refresh + active device probing (not
    just the message regex), the stuck waiter is tracked, and recovery
    completes on the healthy devices. Too many stuck waiters = fatal."""
    from shadernn_tpu.parallel.elastic import StepTimeout

    ee = _make(data=2, batch=2)
    ee.step_timeout_s = 0.05

    class Hang:
        dtype = np.float32

        def block_until_ready(self):
            import time

            time.sleep(0.5)

    real_run = ee.engine.run
    calls = {"n": 0}

    def hang_once(inputs):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"y": Hang()}
        return real_run(inputs)

    monkeypatch.setattr(ee.engine, "run", hang_once)
    probed = {"n": 0}
    orig_probe = ee._probe_devices
    monkeypatch.setattr(
        ee, "_probe_devices",
        lambda: probed.__setitem__("n", probed["n"] + 1) or orig_probe(),
    )
    out = ee.run({"input": np.zeros((2, 16, 24, 1), np.float32)})
    assert probed["n"] == 1  # the timeout path probed the devices
    assert ee.rebuilds == 1
    assert len(ee._leaked) <= 1  # stuck waiter tracked, not accumulated
    assert any(v is not None for v in out.values())

    # waiter-cap: exceeding MAX_LEAKED_WAITERS is fatal, not an endless loop
    ee2 = _make(data=1, batch=2)
    ee2.step_timeout_s = 0.01
    ee2._leaked = [type("T", (), {"is_alive": lambda self: True})()] * (
        ee2.MAX_LEAKED_WAITERS + 1
    )
    monkeypatch.setattr(ee2.engine, "run", lambda inputs: {"y": Hang()})
    with pytest.raises(RuntimeError, match="wedged"):
        ee2.run({"input": np.zeros((2, 16, 24, 1), np.float32)})
