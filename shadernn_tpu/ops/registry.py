"""Op registry: op-type string -> OpDef.

Analog of the reference's layer factory (`initLayerRegisty()` string->creator
map, core/src/ic2/layerFactory.cpp:109-129 + DECLARE_LAYER macros,
layerFactory.h:22-111). The op-type vocabulary matches the model-JSON
"type" field so zoo artifacts parse directly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

from shadernn_tpu.graph.ir import Node, TensorSpec


@dataclasses.dataclass
class RunCtx:
    """Per-compilation context handed to op bodies."""

    precision: object = None  # shadernn_tpu.config.Precision
    backend: object = None  # BackendKind for this node
    mesh: object = None  # jax Mesh or None
    sharding: object = None  # ShardingOptions
    training: bool = False


class OpDef:
    """One operator definition.

    Subclasses implement:
      infer(node, in_specs) -> TensorSpec   (shape propagation)
      run(node, xs, ctx) -> jax array       (compute body; xs in node.inputs order)
    """

    op_name: str = ""

    def infer(self, node: Node, in_specs: Sequence[TensorSpec]) -> TensorSpec:
        raise NotImplementedError

    def run(self, node: Node, xs: List, ctx: RunCtx):
        raise NotImplementedError

    # FLOPs estimate for the profiler/roofline report (optional override).
    def flops(self, node: Node, in_specs: Sequence[TensorSpec]) -> int:
        return 0


_REGISTRY: Dict[str, OpDef] = {}
_ALIASES: Dict[str, str] = {}


def register(name: str, *aliases: str) -> Callable:
    """Class decorator: instantiate and register under `name` (+aliases)."""

    def deco(cls):
        cls.op_name = name
        inst = cls()
        _REGISTRY[name] = inst
        for a in aliases:
            _ALIASES[a] = name
        return cls

    return deco


def canonical_op(name: str) -> str:
    """Resolve an op-type alias to its canonical registry name."""
    return _ALIASES.get(name, name)


def get_op(name: str) -> OpDef:
    canonical = _ALIASES.get(name, name)
    if canonical not in _REGISTRY:
        raise KeyError(
            f"unknown op type {name!r}; registered: {sorted(_REGISTRY)} "
            f"(aliases: {sorted(_ALIASES)})"
        )
    return _REGISTRY[canonical]


def all_ops() -> List[str]:
    return sorted(_REGISTRY)
