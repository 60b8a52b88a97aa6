"""SPMD sharding rules for CNN inference graphs.

Maps the model onto the (data, model, spatial) mesh:

- **DP**: input frames sharded on the batch axis.
- **TP**: conv/dense weights sharded on the output-channel axis, and
  activations on C. This is ShaderNN's MRT per-pass channel chunking
  (conv2dGL.cpp:841-860) lifted from "multiple passes on one GPU" to
  "chips in a mesh"; XLA inserts the all-gathers/psums the shader loop
  implied.
- **SP (spatial)**: activations sharded on H. XLA's SPMD partitioner
  performs the halo exchange for spatially-sharded convolutions
  automatically (collective-permute of kernel//2 boundary rows over ICI)
  — the GSPMD baseline of the "halo exchange conv"; the hand-overlapped
  Pallas version lives in shadernn_tpu.kernels.halo.

All rules are advisory constraints: when a tensor doesn't divide evenly,
we leave that axis unsharded rather than pad.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadernn_tpu.config import EngineOptions, ShardingOptions
from shadernn_tpu.graph.ir import Graph

# Weight tensors whose trailing axis is the conv/dense output channel and
# may be sharded along the model axis.
_OUT_CHANNEL_PARAMS = ("weight", "weight_q", "bias", "bn_gamma", "bn_beta",
                       "bn_mean", "bn_variance", "gamma", "beta", "mean", "variance")


def _divisible(dim: int, ways: int) -> bool:
    return ways > 1 and dim % ways == 0


def sharding_plan(
    graph: Graph, mesh: Mesh, opts: ShardingOptions
) -> Dict[str, Dict[str, P]]:
    """PartitionSpec per param leaf, keyed like the params pytree."""
    plan: Dict[str, Dict[str, P]] = {}
    tp = opts.model
    # jax 0.9.0 GSPMD miscompiles a convolution whose lhs is spatially
    # sharded AND whose rhs is output-feature sharded (verified minimal
    # repro; pure-SP and pure-TP are both correct). Until the explicit
    # shard_map halo-conv path owns SP, keep weights replicated when the
    # spatial axis is active — TP then costs weight memory but stays
    # correct.
    if opts.spatial > 1:
        tp = 1
    for n in graph.nodes.values():
        if not n.params:
            continue
        specs: Dict[str, P] = {}
        for k, v in n.params.items():
            v = np.asarray(v)
            spec = P()
            if k in _OUT_CHANNEL_PARAMS and _divisible(v.shape[-1], tp):
                # Shard the output-channel (trailing) axis over `model`.
                spec = P(*([None] * (v.ndim - 1) + [opts.model_axis]))
            elif k == "weight_scale" and _divisible(v.shape[-1], tp):
                spec = P(*([None] * (v.ndim - 1) + [opts.model_axis]))
            specs[k] = spec
        plan[n.name] = specs
    return plan


def input_spec(shape, opts: ShardingOptions) -> P:
    """NHWC input frames: batch over data, H over spatial, C over model
    (C sharding only if divisible; inputs usually have tiny C — skip)."""
    n, h = shape[0], shape[1] if len(shape) == 4 else None
    parts = [None] * len(shape)
    if _divisible(n, opts.data) or opts.data == 1:
        if opts.data > 1:
            parts[0] = opts.data_axis
    if len(shape) == 4 and _divisible(shape[1], opts.spatial):
        parts[1] = opts.spatial_axis
    return P(*parts)


def shard_compiled(
    graph: Graph,
    options: EngineOptions,
    params,
    forward: Callable,
    mesh: Mesh,
):
    """jit the forward fn with mesh shardings. Returns a CompiledModel.

    Default route is the explicit shard_map executor (parallel/spmd.py):
    TP stays on under SP and Pallas kernels survive sharding. The GSPMD
    auto-partitioning path below remains available via
    EngineOptions(spmd_mode="gspmd") as a baseline/cross-check.
    """
    if options.spmd_mode == "shard_map":
        from shadernn_tpu.parallel.spmd import shard_compiled_spmd

        return shard_compiled_spmd(graph, options, params, mesh)
    from shadernn_tpu.engine.compile import CompiledModel

    opts = options.sharding
    plan = sharding_plan(graph, mesh, opts)

    def leaf_sharding(node_name, param_name):
        return NamedSharding(mesh, plan[node_name][param_name])

    params = {
        node: {
            k: jax.device_put(jnp.asarray(v), leaf_sharding(node, k))
            for k, v in d.items()
        }
        for node, d in params.items()
    }
    param_shardings = {
        node: {k: leaf_sharding(node, k) for k in d} for node, d in params.items()
    }
    in_shardings = {
        name: NamedSharding(mesh, input_spec(graph.nodes[name].out_spec.shape, opts))
        for name in graph.input_names
    }
    step = jax.jit(
        forward,
        in_shardings=(param_shardings, in_shardings),
        donate_argnums=(1,) if options.donate_input else (),
    )
    input_specs = {n: graph.nodes[n].out_spec.shape for n in graph.input_names}
    return CompiledModel(graph, options, params, step, input_specs, forward)
