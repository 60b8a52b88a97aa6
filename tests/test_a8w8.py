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

import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# A8W8 on the XLA path (standard convs / dense, C>=32 — the ResNet18 regime)
# ---------------------------------------------------------------------------

def _cls_graph():
    """A small ResNet-shaped classifier slice: conv stack -> pool -> dense.
    C>=32 throughout, so the A8W8 int8 MXU path applies to every matmul."""
    b = GraphBuilder("cls_a8w8")
    x = b.input(16, 16, 32, name="input")
    c1 = b.conv2d(x, 64, 3, activation="relu", name="c1")
    c2 = b.conv2d(c1, 64, 3, activation="relu", name="c2")
    p = b.avgpool(c2, 2, name="pool")
    f = b.flatten(p, name="flat")
    b.dense(f, 10, name="fc")
    return b.build()


def _xla_engine(g, batch, precision=Precision.FP32):
    return Engine.from_graph(
        g, EngineOptions(precision=precision, batch_size=batch,
                         backend=BackendKind.XLA),
    )


def test_a8w8_xla_conv_dense_engages_and_matches(rng):
    """calibrate -> quantize -> rebuild: the XLA path must lower int8 x int8
    convolutions (s8 operands in the StableHLO) and stay within the
    reference's low-precision tolerance (testutil.h:1195 discipline)."""
    x = (rng.random((4, 16, 16, 32), dtype=np.float32) - 0.5)
    want = np.asarray(_xla_engine(_cls_graph(), 4).run_single(x))

    g = _cls_graph()
    quantize_graph_weights(g)
    eng = _xla_engine(g, 4, Precision.INT8)
    calibrate_activations(eng, [{"input": x}], percentile=None)
    eng2 = _xla_engine(g, 4, Precision.INT8)

    # every quantized consumer got stamped with its input scale
    for name in ("c1", "c2", "fc"):
        assert float(g.nodes[name].attrs.get("in_act_scale", 0.0)) > 0.0, name

    # The lowered program really runs int8 x int8 -> int32 convolutions.
    # NOTE: checking for "xi8>" alone is vacuous — int8 weight_q params
    # appear in the weight-only lowering too; the A8W8 signature is a
    # convolution/dot whose OPERANDS are i8 and whose RESULT accumulates
    # in i32, which weight-only (f32-accumulating) never produces.
    hlo = eng2.model.step.lower(
        eng2.model.params, {"input": jnp.zeros((4, 16, 16, 32), jnp.float32)}
    ).as_text()
    int8_accum_lines = [
        ln for ln in hlo.splitlines()
        if ("convolution" in ln or "dot" in ln)
        and "xi8>" in ln and "xi32>" in ln
    ]
    assert int8_accum_lines, "A8W8 did not lower int8 x int8 -> int32 conv/dot"

    got = np.asarray(eng2.run_single(x), np.float32)
    scale = np.max(np.abs(want)) + 1e-6
    err = np.max(np.abs(got - want)) / scale
    assert err < 0.1, err


def test_a8w8_gated_on_int8_precision(rng):
    """A calibrated+quantized graph rebuilt at FP32 must NOT silently run
    int8 activation compute (advisor r3): the A8W8 branch is gated on
    ctx.precision == INT8, so the FP32 rebuild lowers no int8-accumulating
    conv and matches the plain dequantized-weight output bit-for-bit."""
    x = (rng.random((2, 16, 16, 32), dtype=np.float32) - 0.5)
    g = _cls_graph()
    quantize_graph_weights(g)
    eng_i8 = _xla_engine(g, 2, Precision.INT8)
    calibrate_activations(eng_i8, [{"input": x}], percentile=None)
    # an INT8 rebuild propagates the scales and runs int8 compute ...
    _xla_engine(g, 2, Precision.INT8)
    assert float(g.nodes["c1"].attrs.get("in_act_scale", 0.0)) > 0.0

    # ... but an FP32 rebuild keeps the stamped scales inert
    eng_fp = _xla_engine(g, 2, Precision.FP32)
    hlo = eng_fp.model.step.lower(
        eng_fp.model.params, {"input": jnp.zeros((2, 16, 16, 32), jnp.float32)}
    ).as_text()
    assert not [
        ln for ln in hlo.splitlines()
        if ("convolution" in ln or "dot" in ln)
        and "xi8>" in ln and "xi32>" in ln
    ], "FP32 rebuild ran int8 activation compute"


def test_a8w8_propagate_skips_multi_input_and_unquantized():
    from shadernn_tpu.quant.calibrate import propagate_input_scales

    g = _cls_graph()
    # no act_scale, no weight_q -> nothing stamped
    assert propagate_input_scales(g) == 0
    quantize_graph_weights(g)
    assert propagate_input_scales(g) == 0  # still no act_scale recorded
    g.nodes["input"].attrs["act_scale"] = 0.01
    assert propagate_input_scales(g) == 1  # only c1 (its producer is input)
    assert "in_act_scale" not in g.nodes["c2"].attrs


def test_chain_a8_engages_and_matches():
    """chain_a8 integration (VERDICT r4 #3): under an INT8 engine with
    calibrated activation scales, the packed chain runs per-layer int8
    dots (in_q > 0 on the eligible layers) and stays within the
    low-precision tolerance of the weight-only output."""
    import dataclasses

    from shadernn_tpu.models import build_model

    x = np.random.default_rng(0).random((2, 48, 64, 1), dtype=np.float32)
    g = build_model("espcn", h=48, w=64)
    opts = EngineOptions(precision=Precision.INT8, batch_size=2,
                         backend=BackendKind.PALLAS)
    eng_w = Engine.from_graph(g, opts)
    calibrate_activations(eng_w, [{"input": x}], percentile=None)
    eng_a8 = Engine.from_graph(g, opts)
    y_a8 = np.asarray(eng_a8.model.run_single(x), np.float32)
    pcs = eng_a8.model.forward.packed_chain_specs
    assert pcs, "packed chain did not plan"
    in_qs = [s.in_q for specs, _h, _w in pcs.values() for s in specs]
    assert sum(1 for q in in_qs if q > 0) >= 2, in_qs
    # a8=off baseline (weight-only int8, bf16/f32 dots)
    eng_off = Engine.from_graph(g, dataclasses.replace(opts, chain_a8="off"))
    pcs_off = None
    y_w = np.asarray(eng_off.model.run_single(x), np.float32)
    pcs_off = eng_off.model.forward.packed_chain_specs
    assert all(s.in_q == 0 for specs, _h, _w in pcs_off.values()
               for s in specs)
    assert float(np.max(np.abs(y_a8 - y_w))) < 0.1  # reference int8 delta
