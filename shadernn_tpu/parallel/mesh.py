"""Device mesh construction.

The reference has no distributed layer (single GPU, single frame —
SURVEY.md §2.5); the TPU build's communication backend IS the
`jax.sharding.Mesh` + XLA collectives over ICI/DCN. Axis convention:

  data    — batch/frame parallelism (frames of the continuous stream)
  model   — channel (tensor) parallelism: conv output channels sharded,
            the multi-chip generalization of ShaderNN's per-pass MRT
            channel chunking (conv2dGL.cpp:841-860)
  spatial — H-dimension partitioning of large frames with halo exchange
            (the CNN analog of sequence/context parallelism)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from shadernn_tpu.config import ShardingOptions


def make_mesh(
    sharding: Optional[ShardingOptions] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model, spatial) mesh over the given devices.

    On a multi-host slice, `jax.devices()` is the global device list and
    the mesh spans hosts: lay `data` outermost so cross-host traffic (DCN)
    only carries batch-parallel collectives, keeping model/spatial
    collectives on ICI.
    """
    sharding = sharding or ShardingOptions()
    devices = list(devices if devices is not None else jax.devices())
    n = sharding.total_devices
    if n > len(devices):
        raise ValueError(
            f"sharding wants {n} devices ({sharding}), only {len(devices)} available"
        )
    grid = np.asarray(devices[:n]).reshape(
        sharding.data, sharding.model, sharding.spatial
    )
    return Mesh(grid, (sharding.data_axis, sharding.model_axis, sharding.spatial_axis))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), ("data", "model", "spatial"))
