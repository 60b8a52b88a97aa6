"""Deployment artifacts: ahead-of-time serialized engines.

The reference ships a model artifact and recompiles shaders on every
device at load; a TPU serving fleet wants the compiled program itself to
be portable. `export_engine` serializes the jitted step as StableHLO
(jax.export) plus the weight pytree, producing a directory a runtime can
load and execute without the model-building code:

    exported/
      step.stablehlo    serialized Exported (portable across jax versions)
      params.npz        weight pytree (node|param keys)
      meta.json         graph/io metadata
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import numpy as np
from jax import export as jax_export

from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.deploy")


def export_engine(engine, path: str) -> str:
    """Serialize the engine's compiled step + params to `path`."""
    os.makedirs(path, exist_ok=True)
    graph = engine.graph
    params = jax.tree.map(np.asarray, engine.model.params)
    act = engine.options.precision.activation_dtype

    param_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )
    input_specs = {
        name: jax.ShapeDtypeStruct(
            graph.nodes[name].out_spec.shape, np.float32
        )
        for name in graph.input_names
    }
    exp = jax_export.export(jax.jit(engine.model.forward))(
        param_specs, input_specs
    )
    with open(os.path.join(path, "step.stablehlo"), "wb") as f:
        f.write(exp.serialize())

    flat = {
        f"{node}|{pname}": arr
        for node, d in params.items()
        for pname, arr in d.items()
    }
    np.savez(os.path.join(path, "params.npz"), **flat)

    meta = {
        "graph": graph.name,
        "inputs": {n: list(graph.nodes[n].out_spec.shape)
                   for n in graph.input_names},
        "outputs": graph.output_names,
        "precision": engine.options.precision.value,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    logger.info("exported %s -> %s (%d weight tensors)",
                graph.name, path, len(flat))
    return path


class ExportedEngine:
    """Runs a serialized engine: no graph/model code needed."""

    def __init__(self, path: str):
        with open(os.path.join(path, "step.stablehlo"), "rb") as f:
            self.exported = jax_export.deserialize(f.read())
        npz = np.load(os.path.join(path, "params.npz"))
        params: Dict[str, Dict[str, np.ndarray]] = {}
        for key in npz.files:
            node, pname = key.split("|", 1)
            params.setdefault(node, {})[pname] = npz[key]
        self.params = params
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    def __call__(self, inputs: Dict[str, np.ndarray]):
        import jax.numpy as jnp

        return self.exported.call(
            self.params, {k: jnp.asarray(v, jnp.float32) for k, v in inputs.items()}
        )

    def run_single(self, x: np.ndarray):
        (in_name,) = list(self.meta["inputs"])
        outs = self({in_name: x})
        return outs[self.meta["outputs"][0]]
