"""A8W8 (int8 activations x int8 weights) path in the fused
inverted-residual block kernel.

VERDICT r2 #7: weight-only INT8 never engages the MXU's int8 path. With
calibrated activation scales (quant/calibrate.py -> attrs['act_scale'])
and quantized weights, the block kernel's two 1x1 matmuls quantize their
activations in-kernel and accumulate in int32. These tests run the full
calibrate -> rebuild -> compare pipeline and check the A8W8 plan actually
engages (spec.ax1/ax2 set), with accuracy inside the reference's
low-precision tolerance discipline (testutil.h:1195).
"""

import numpy as np
import pytest

import shadernn_tpu as snn
from shadernn_tpu.config import BackendKind, EngineOptions, Precision
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.quant.calibrate import calibrate_activations
from shadernn_tpu.quant.quantize import quantize_graph_weights

from tests import oracle


def _block_graph():
    """One MobileNet-shaped inverted-residual block (C>=32: the A8W8
    regime — the c-tile padding argument against int8 at ESPCN widths
    does not apply here)."""
    b = GraphBuilder("invres_a8w8")
    x = b.input(16, 16, 32, name="input")
    e = b.conv2d(x, 128, 1, activation="relu6", name="expand")
    d = b.depthwise(e, 3, activation="relu6", name="dw")
    p = b.conv2d(d, 32, 1, name="project")
    b.add([x, p], name="res")
    return b.build()


def _calibrated_engine(x):
    g = _block_graph()
    quantize_graph_weights(g)
    eng = Engine.from_graph(
        g, EngineOptions(precision=Precision.INT8, batch_size=x.shape[0],
                         backend=BackendKind.XLA),
    )
    calibrate_activations(eng, [{"input": x}], percentile=None)
    # rebuild on the PALLAS path: the block planner reads act_scale attrs
    return Engine.from_graph(
        g, EngineOptions(precision=Precision.INT8, batch_size=x.shape[0],
                         backend=BackendKind.PALLAS),
    )


def test_a8w8_block_engages_and_matches(rng):
    x = (rng.random((2, 16, 16, 32), dtype=np.float32) - 0.5)
    want = np.asarray(Engine.from_graph(
        _block_graph(),
        EngineOptions(precision=Precision.FP32, batch_size=2,
                      backend=BackendKind.XLA),
    ).run_single(x))

    eng = _calibrated_engine(x)
    # the plan must actually be A8W8, not weight-only
    plan = eng.model.forward.block_plan
    assert plan, "block planner did not fuse the inverted residual"
    got = np.asarray(eng.run_single(x), np.float32)
    assert got.shape == want.shape
    # int8 activations: reference low-precision tolerance discipline
    scale = np.max(np.abs(want)) + 1e-6
    err = np.max(np.abs(got - want)) / scale
    assert err < 0.1, err


def test_a8w8_spec_scales_set(rng):
    """build_invres folds the calibrated scales into the spec/epilogues."""
    from shadernn_tpu.kernels.block_pallas import build_invres

    x = (rng.random((2, 16, 16, 32), dtype=np.float32) - 0.5)
    g = _block_graph()
    quantize_graph_weights(g)
    eng = Engine.from_graph(
        g, EngineOptions(precision=Precision.INT8, batch_size=2,
                         backend=BackendKind.XLA),
    )
    calibrate_activations(eng, [{"input": x}], percentile=None)

    class V:
        def __init__(self, node):
            self._n = node
            self.params = node.params

        def attr(self, k, d=None):
            return self._n.attrs.get(k, d)

    nodes = g.nodes
    built = build_invres(
        [V(nodes["expand"]), V(nodes["dw"]), V(nodes["project"]), V(nodes["res"])],
        nodes["input"].out_spec, np.dtype("float32"), batch=2,
        in_act_scale=float(nodes["input"].attrs["act_scale"]),
    )
    assert built is not None
    _, spec = built
    assert spec.ax1 > 0 and spec.ax2 > 0, (spec.ax1, spec.ax2)
