"""Activation-range calibration for full INT8 inference.

Weight-only INT8 (quant/quantize.py) needs no calibration. Going further —
int8 activations feeding the MXU's int8 path (2x bf16 throughput, half the
DMA traffic) — requires per-layer activation scales. This module collects
them: run representative batches with per-layer capture and record
absolute-max (or percentile) ranges per layer into `graph.meta` and
per-node attrs, ready for an A8W8 kernel path and serialized with the
artifact.

The reference has no analog (its low-precision story stops at FP16); this
follows standard post-training-quantization practice.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np

from shadernn_tpu.graph.ir import Graph
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.calibrate")


def calibrate_activations(
    engine,
    batches: Iterable[Dict[str, np.ndarray]],
    percentile: Optional[float] = 99.9,
) -> Dict[str, float]:
    """Run calibration batches, recording per-layer activation ranges.

    Returns {layer_name: scale} with scale = range/127 for symmetric int8,
    and stores them on each node (attrs['act_scale']) + graph.meta.
    percentile=None uses the absolute max (more outlier-sensitive).
    """
    import dataclasses

    import jax.numpy as jnp

    from shadernn_tpu.engine.compile import compile_graph

    graph: Graph = engine.graph
    opts = dataclasses.replace(engine.options, dump_outputs=True)
    model = compile_graph(graph, opts)

    ranges: Dict[str, float] = {}
    nbatches = 0
    for batch in batches:
        outs = model({k: jnp.asarray(v) for k, v in batch.items()})
        # model inputs are activations too (the first conv's A8 operand)
        dumps = dict(outs["__dumps__"])
        dumps.update(batch)
        for name, act in dumps.items():
            a = np.abs(np.asarray(act, np.float32))
            r = (
                float(np.percentile(a, percentile))
                if percentile is not None
                else float(a.max())
            )
            ranges[name] = max(ranges.get(name, 0.0), r)
        nbatches += 1
    logger.info("calibrated %d layers over %d batches", len(ranges), nbatches)

    scales = {}
    for name, r in ranges.items():
        scale = r / 127.0 if r > 0 else 1.0
        scales[name] = scale
        graph.nodes[name].attrs["act_scale"] = scale
    graph.meta["act_scales"] = scales
    return scales


def quantize_activation(x: np.ndarray, scale: float) -> np.ndarray:
    """Reference implementation of the symmetric activation quantizer the
    A8W8 kernel path applies (clip to +/-127)."""
    return np.clip(np.round(np.asarray(x, np.float32) / scale), -127, 127).astype(
        np.int8
    )


def quantization_snr_db(x: np.ndarray, scale: float) -> float:
    """Signal-to-quantization-noise for a given scale (calibration QA)."""
    q = quantize_activation(x, scale).astype(np.float32) * scale
    err = np.mean((np.asarray(x, np.float32) - q) ** 2)
    sig = np.mean(np.asarray(x, np.float32) ** 2)
    if err == 0:
        return float("inf")
    return float(10 * np.log10(sig / err))


# Ops whose XLA path can consume an int8-quantized input operand when the
# weights are already int8 (A8W8: int8 x int8 -> int32 on the MXU's
# 2x-rate int8 path). Depthwise (SeparableConv2D) deliberately stays
# bf16 — it is VPU-bound, not MXU-bound (DEVNOTES block-kernel notes).
A8W8_OPS = ("Conv2D", "Dense")


def propagate_input_scales(graph: Graph) -> int:
    """Stamp each quantized node with its input activation scale.

    calibrate_activations() records `act_scale` on each PRODUCING node
    (the scale of that node's output). A consuming conv/dense needs the
    scale of its INPUT to quantize the activation operand; this prepass
    copies producer act_scale -> consumer attrs['in_act_scale'] for every
    single-input node with int8 weights. compile_graph calls it before
    tracing, so the ops can engage the A8W8 path without graph access.
    Multi-input nodes (channel-concat convs) are skipped: their inputs
    carry different scales. Returns the number of nodes stamped.
    """
    count = 0
    for n in graph.nodes.values():
        if n.op not in A8W8_OPS or "weight_q" not in n.params:
            continue
        if len(n.inputs) != 1:
            continue
        producer = graph.nodes.get(n.inputs[0])
        if producer is None:
            continue
        sa = producer.attrs.get("act_scale")
        if sa:
            n.attrs["in_act_scale"] = float(sa)
            count += 1
    return count
