"""Multi-host (multi-process) scaffolding: DCN-aware meshes + per-host ingest.

BASELINE.md's scaling contract is 1 chip -> 1 host -> 2 hosts. On a
multi-host slice (e.g. v5e-16 = 4 hosts x 4 chips) every process runs the
same program; `jax.distributed.initialize` wires the coordinator and makes
`jax.devices()` the GLOBAL device list. The layout rule (scaling-book):
the `data` axis is laid PROCESS-MAJOR so its collectives are the only ones
that cross DCN — `model`/`spatial` collectives (all_gather of TP channel
shards, halo ppermutes) stay inside a host's ICI domain.

Launch recipe (one command per host, v5e-16):

  SNN_COORDINATOR=host0:8476 SNN_NUM_PROCESSES=4 SNN_PROCESS_ID=$i \
      python your_serving_entry.py

with `initialize_from_env()` at the top of the entry; then
`make_multihost_mesh(ShardingOptions(data=4, model=2, spatial=2))` and the
regular Engine API — `host_local_inputs` turns each host's locally
ingested frames (its own camera/decoder shard of the global batch) into
the global jax.Array the sharded step expects.

The CI story (SURVEY.md §4 "fake backends"): the same code path runs as N
CPU processes with gloo collectives — tests/test_multihost.py and
`python -m shadernn_tpu.parallel.scaling --multihost` spawn 2 subprocesses
of `python -m shadernn_tpu.parallel.multihost` and check a sharded
inference step end-to-end, so no TPU pod is needed to validate the wiring.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from shadernn_tpu.config import ShardingOptions
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.multihost")


def initialize_from_env() -> bool:
    """`jax.distributed.initialize` from SNN_* (or JAX-standard) env vars.

    Returns True if distributed mode was initialized, False for the
    single-process fallback (no coordinator configured). Idempotent.
    """
    import jax

    coord = os.environ.get("SNN_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coord:
        return False
    nproc = int(os.environ.get("SNN_NUM_PROCESSES", "0") or 0)
    pid = os.environ.get("SNN_PROCESS_ID")
    initialize(coord, nproc or None, int(pid) if pid is not None else None)
    return jax.process_count() > 1


def initialize(
    coordinator_address: str,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Wire this process into the multi-host job. On CPU platforms the
    gloo collectives implementation is selected automatically (the CI /
    smoke-test transport); on TPU pods the PJRT defaults apply."""
    import jax

    if jax.config.jax_platforms and "cpu" in str(jax.config.jax_platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def make_multihost_mesh(sharding: ShardingOptions):
    """(data, model, spatial) mesh over the global device list with `data`
    process-major, so DCN only ever carries data-axis collectives.

    Requires model*spatial to evenly divide one process's device count (a
    host's ICI domain) — raises otherwise, because a model/spatial
    collective spanning DCN would be orders of magnitude slower than ICI.
    """
    import jax
    from jax.sharding import Mesh

    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    local = jax.local_device_count()
    fixed = sharding.model * sharding.spatial
    if fixed > local or local % fixed != 0:
        raise ValueError(
            f"model*spatial = {fixed} must evenly divide the per-host device "
            f"count {local}: otherwise a model/spatial group straddles a "
            "host boundary and its collectives cross DCN. Put host-spanning "
            "parallelism on the data axis."
        )
    n = sharding.total_devices
    if n > len(devices):
        raise ValueError(
            f"sharding wants {n} devices, only {len(devices)} available"
        )
    grid = np.asarray(devices[:n]).reshape(
        sharding.data, sharding.model, sharding.spatial
    )
    return Mesh(grid, (sharding.data_axis, sharding.model_axis, sharding.spatial_axis))


def host_local_inputs(mesh, input_specs: Dict[str, object], local: Dict[str, np.ndarray]):
    """Per-host ingest: assemble the global batch from each process's local
    shard (its slice of the data axis). `local` maps input name -> this
    host's frames; the result is the global jax.Array the sharded step
    expects. Single-process meshes pass through via device_put."""
    import jax
    from jax.sharding import NamedSharding

    out = {}
    for name, arr in local.items():
        sh = NamedSharding(mesh, input_specs[name])
        if jax.process_count() == 1:
            out[name] = jax.device_put(np.asarray(arr), sh)
        else:
            out[name] = jax.make_array_from_process_local_data(sh, np.asarray(arr))
    return out


# ---------------------------------------------------------------------------
# Smoke-test worker: `python -m shadernn_tpu.parallel.multihost <pid> <nproc>`
# (spawned N times by tests/test_multihost.py and scaling.py --multihost).


def _worker(argv) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, nproc = int(argv[0]), int(argv[1])
    port = argv[2] if len(argv) > 2 else "29411"
    mode = argv[3] if len(argv) > 3 else "dp"
    if mode == "v5e16":
        # v5e-16 shape: 4 hosts x 4 chips. Pin 4 virtual devices per
        # process regardless of inherited XLA_FLAGS.
        jax.config.update("jax_num_cpu_devices", 4)
    else:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
        )
    initialize(f"127.0.0.1:{port}", nproc, pid)

    import jax.numpy as jnp

    from shadernn_tpu.config import EngineOptions, Precision
    from shadernn_tpu.engine.engine import Engine
    from shadernn_tpu.models.zoo import build_model

    local = jax.local_device_count()
    if mode == "v5e16":
        # data=4 across hosts, model x spatial = 4 inside each host: the
        # BASELINE v5e-16 layout. The process-major mesh must put ONLY
        # data-axis collectives across the process (DCN) boundary.
        assert nproc == 4 and local == 4, (nproc, local)
        sharding = ShardingOptions(data=4, model=2, spatial=2)
        mesh = make_multihost_mesh(sharding)
        assert mesh.devices.shape == (4, 2, 2)
        for di in range(4):
            owners = {d.process_index for d in mesh.devices[di].flat}
            assert len(owners) == 1, (
                f"data-slice {di} spans processes {owners}: model/spatial "
                "collectives would cross DCN"
            )
    else:
        sharding = ShardingOptions(data=nproc * local)  # DP across hosts
        mesh = make_multihost_mesh(sharding)
        assert mesh.devices.shape == (nproc * local, 1, 1)

    per_host = local  # 1 frame per device
    options = EngineOptions(
        batch_size=per_host * nproc, precision=Precision.FP32, sharding=sharding
    )
    eng = Engine.from_graph(build_model("espcn", h=64, w=64), options, mesh=mesh)
    cm = eng.model
    g = cm.graph
    spec = cm.spmd_plan.input_specs["input"]
    assert spec[0] is not None, f"DP axis missing from input spec {spec}"

    rng = np.random.default_rng(0)  # same seed everywhere: global batch
    x_global = rng.random((per_host * nproc, 64, 64, 1), dtype=np.float32)
    lo = pid * per_host
    inputs = host_local_inputs(
        mesh, cm.spmd_plan.input_specs, {"input": x_global[lo : lo + per_host]}
    )
    out = cm.step(cm.params, inputs)[g.output_names[0]]

    # Every process checks its local output shards against the
    # single-device reference for those frames.
    ref = Engine.from_graph(
        build_model("espcn", h=64, w=64),
        EngineOptions(batch_size=per_host * nproc, precision=Precision.FP32),
    ).model
    want = np.asarray(
        ref.step(ref.params, {"input": jnp.asarray(x_global)})[g.output_names[0]]
    )
    for shard in out.addressable_shards:
        # full index tuple: shards may be cut along batch AND spatial axes
        np.testing.assert_allclose(
            np.asarray(shard.data), want[shard.index], rtol=1e-5, atol=1e-5
        )
    print(f"MULTIHOST_OK pid={pid} procs={jax.process_count()} "
          f"devices={jax.device_count()}", flush=True)


if __name__ == "__main__":
    import sys

    _worker(sys.argv[1:])
