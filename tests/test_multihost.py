"""Multi-host scaffolding (parallel/multihost.py): 2-process CPU smoke.

Spawns two real OS processes that `jax.distributed.initialize` against a
local coordinator (gloo CPU collectives), build a process-major DP mesh,
assemble the global batch with per-host `host_local_inputs`, run one
sharded Engine step, and verify every local output shard against the
single-device reference. This validates the cross-host init/mesh/ingest
code the BASELINE 1->2 host scaling contract needs, with no TPU pod.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_smoke():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Fresh interpreters must not inherit this test process's platform
    # pinning; the worker sets jax_platforms=cpu itself.
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "shadernn_tpu.parallel.multihost",
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        # Local device count varies with inherited XLA_FLAGS (conftest sets
        # 8 virtual devices); the contract is 2 processes, all OK.
        assert f"MULTIHOST_OK pid={pid} procs=2" in out, out[-2000:]


def test_multihost_mesh_requires_ici_for_model_axes():
    # Single-process path: make_multihost_mesh still builds a plain mesh and
    # rejects model/spatial axes larger than the local device count.
    import jax

    from shadernn_tpu.config import ShardingOptions
    from shadernn_tpu.parallel.multihost import make_multihost_mesh

    n = jax.local_device_count()
    mesh = make_multihost_mesh(ShardingOptions(data=n))
    assert mesh.devices.shape == (n, 1, 1)
    with pytest.raises(ValueError, match="DCN"):
        make_multihost_mesh(ShardingOptions(model=2 * n))


def test_host_local_inputs_single_process_passthrough():
    import jax
    from jax.sharding import PartitionSpec as P

    from shadernn_tpu.config import ShardingOptions
    from shadernn_tpu.parallel.multihost import (
        host_local_inputs, make_multihost_mesh,
    )

    mesh = make_multihost_mesh(ShardingOptions(data=2))
    x = np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1)
    (arr,) = host_local_inputs(
        mesh, {"input": P("data", None, None, None)}, {"input": x}
    ).values()
    assert arr.shape == x.shape
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 2


def test_initialize_from_env_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("SNN_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    from shadernn_tpu.parallel.multihost import initialize_from_env

    assert initialize_from_env() is False


def test_v5e16_shaped_4x4():
    """v5e-16-shaped CI (VERDICT r2 #9): 4 processes x 4 virtual devices,
    data=4 across hosts with model x spatial = 2 x 2 inside each host.
    Each worker asserts the process-major mesh keeps every model/spatial
    submesh within one process (only data collectives cross DCN) and
    checks its local output shards against the single-device reference."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "shadernn_tpu.parallel.multihost",
             str(pid), "4", str(port), "v5e16"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True,
        )
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid} procs=4" in out, out[-2000:]
