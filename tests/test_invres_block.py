"""Fused inverted-residual block kernel (kernels/block_pallas.py) vs the
XLA op-by-op oracle.

Covers the MobileNetV2 geometry family (reference zoo
modelzoo/MobileNetV2/mobilenetV2.json; depthwise shaders
separableconvolutionGL.cpp:523,715): expand/no-expand (t=1), residual and
non-residual, batch tiling across image boundaries (the row-mask path),
int8 weight-only quantization, and the graph-level AUTO planner.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadernn_tpu.config import BackendKind, EngineOptions, Precision
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.graph.fusion import optimize
from shadernn_tpu.kernels.block_pallas import (
    InvResSpec, fused_invres_block, plan_b_tile,
)


def _oracle(x, w1, wd, w2, residual, act="relu6"):
    """Plain-XLA inverted residual (f32)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    e = x
    if w1 is not None:
        e = jax.lax.conv_general_dilated(
            x, w1.reshape(1, 1, *w1.shape), (1, 1), "SAME", dimension_numbers=dn)
        e = jnp.clip(e, 0.0, 6.0)
    c = e.shape[-1]
    d = jax.lax.conv_general_dilated(
        e, wd.reshape(3, 3, 1, c), (1, 1), "SAME",
        dimension_numbers=dn, feature_group_count=c)
    d = jnp.clip(d, 0.0, 6.0)
    y = jax.lax.conv_general_dilated(
        d, w2.reshape(1, 1, *w2.shape), (1, 1), "SAME", dimension_numbers=dn)
    if residual:
        y = y + x
    return y


@pytest.mark.parametrize(
    "n,h,w,cin,e,cout,has_expand,residual",
    [
        (1, 14, 14, 32, 192, 32, True, True),
        (2, 14, 14, 32, 192, 32, True, True),   # b_tile=2: cross-image masks
        (4, 7, 7, 48, 288, 48, True, True),     # 49 px: sublane-odd geometry
        (1, 12, 12, 32, 32, 16, False, False),  # t=1 (no expand), no residual
        (2, 16, 16, 24, 144, 40, True, False),  # cout != cin
    ],
)
def test_kernel_vs_oracle(n, h, w, cin, e, cout, has_expand, residual):
    rng = np.random.RandomState(0)
    x = rng.randn(n, h, w, cin).astype(np.float32)
    w1 = (rng.randn(cin, e) * 0.2).astype(np.float32) if has_expand else None
    wd = (rng.randn(9, e if has_expand else cin) * 0.2).astype(np.float32)
    w2 = (rng.randn(e if has_expand else cin, cout) * 0.2).astype(np.float32)
    e_ch = e if has_expand else cin

    spec = InvResSpec(
        h=h, w=w, cin=cin, e=e_ch, cout=cout, has_expand=has_expand,
        residual=residual, act_expand="relu6" if has_expand else "linear",
        act_dw="relu6", act_out="linear",
    )
    got = fused_invres_block(
        jnp.asarray(x),
        None if w1 is None else jnp.asarray(w1),
        None if w1 is None else jnp.ones(e_ch),
        None if w1 is None else jnp.zeros(e_ch),
        jnp.asarray(wd), jnp.ones(e_ch), jnp.zeros(e_ch),
        jnp.asarray(w2), jnp.ones(cout), jnp.zeros(cout),
        spec, interpret=True,
    )
    assert got is not None
    want = _oracle(jnp.asarray(x),
                   None if w1 is None else jnp.asarray(w1),
                   jnp.asarray(wd), jnp.asarray(w2), residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_b_tile_respects_sublane_rule():
    spec = InvResSpec(h=14, w=14, cin=64, e=384, cout=64, has_expand=True,
                      residual=True, act_expand="relu6", act_dw="relu6",
                      act_out="linear")
    # 196 px per image: b=1 blocks are not 8-divisible, so b must be n or
    # a multiple giving p % 8 == 0 (b=2 -> 392).
    assert plan_b_tile(spec, 1, 4) == 1          # whole-array block
    assert plan_b_tile(spec, 8, 4) in (2, 4, 8)  # 392/784/1568 all divisible
    assert (plan_b_tile(spec, 8, 4) * 196) % 8 == 0


def _mini_invres_graph(h=14, w=14):
    b = GraphBuilder("mini_invres", seed=3)
    x = b.input(h, w, 32, name="in")
    x = b.conv2d(x, 32, 3, name="stem", activation="relu6")
    for i in range(2):
        y = b.conv2d(x, 192, 1, use_bias=False, name=f"b{i}_expand")
        y = b.batchnorm(y, activation="relu6", name=f"b{i}_expand_bn")
        y = b.depthwise(y, 3, use_bias=False, name=f"b{i}_dw")
        y = b.batchnorm(y, activation="relu6", name=f"b{i}_dw_bn")
        y = b.conv2d(y, 32, 1, use_bias=False, name=f"b{i}_project")
        y = b.batchnorm(y, name=f"b{i}_project_bn")
        x = b.add([x, y], name=f"b{i}_add")
    b.conv2d(x, 8, 1, name="head")
    return b.build()


def _compile_mini(backend, precision=Precision.FP32, quantize=False):
    g = _mini_invres_graph()
    optimize(g)
    if quantize:
        from shadernn_tpu.quant.quantize import quantize_graph_weights

        g.infer_shapes(batch_size=2)
        quantize_graph_weights(g)
    return compile_graph(g, EngineOptions(batch_size=2, precision=precision,
                                          backend=backend))


def test_graph_planner_fuses_and_matches():
    os.environ["SNN_AUTO_PALLAS_ANYWHERE"] = "1"
    try:
        cm = _compile_mini(BackendKind.AUTO)
        assert len(cm.forward.block_plan) == 2, cm.forward.block_plan
        for head, members in cm.forward.block_plan.items():
            assert len(members) == 4  # expand, dw, project, add
        x = np.random.RandomState(1).rand(2, 14, 14, 32).astype(np.float32)
        got = np.asarray(cm.run_single(x))
        ref = _compile_mini(BackendKind.XLA)
        assert not ref.forward.block_plan
        want = np.asarray(ref.run_single(x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    finally:
        os.environ.pop("SNN_AUTO_PALLAS_ANYWHERE", None)


def test_graph_planner_int8():
    os.environ["SNN_AUTO_PALLAS_ANYWHERE"] = "1"
    try:
        cm = _compile_mini(BackendKind.AUTO, quantize=True)
        assert len(cm.forward.block_plan) == 2
        x = np.random.RandomState(1).rand(2, 14, 14, 32).astype(np.float32)
        got = np.asarray(cm.run_single(x))
        ref = _compile_mini(BackendKind.XLA, quantize=True)
        want = np.asarray(ref.run_single(x))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    finally:
        os.environ.pop("SNN_AUTO_PALLAS_ANYWHERE", None)


def test_spatial_gate_excludes_large_planes():
    os.environ["SNN_AUTO_PALLAS_ANYWHERE"] = "1"
    try:
        g = _mini_invres_graph(h=56, w=56)  # 3136 px > 784 gate
        optimize(g)
        cm = compile_graph(g, EngineOptions(batch_size=1))
        assert not cm.forward.block_plan
    finally:
        os.environ.pop("SNN_AUTO_PALLAS_ANYWHERE", None)


def test_mobilenetv2_plans_small_spatial_blocks():
    os.environ["SNN_AUTO_PALLAS_ANYWHERE"] = "1"
    try:
        from shadernn_tpu.models.zoo import build_model

        g = build_model("mobilenetv2")
        optimize(g)
        cm = compile_graph(g, EngineOptions(batch_size=1))
        plan = cm.forward.block_plan
        # 13 stride-1 blocks total; 112x112 (block0) and 56x56 (block2)
        # stay on XLA per the measured spatial gate -> 11 fused.
        assert len(plan) == 11, sorted(plan)
        assert "block0_dw" not in plan and "block2_expand" not in plan
        assert "block4_expand" in plan and "block16_expand" in plan
    finally:
        os.environ.pop("SNN_AUTO_PALLAS_ANYWHERE", None)


def test_chain_c_pad_follows_activation_dtype():
    """Regression: build_chain hardcoded the bf16 sublane tile (16), so f32
    chains DMA'd (rows, 8, W) HBM slices into (rows, 16, W) scratch —
    a Mosaic verification error on real TPU (aidenoise fp32)."""
    import jax.numpy as jnp

    from shadernn_tpu.graph.builder import GraphBuilder
    from shadernn_tpu.kernels.chain_pallas import build_chain
    from shadernn_tpu.kernels.conv_pallas import _c_tile

    b = GraphBuilder("chain", seed=0)
    x = b.input(32, 32, 4, name="in")
    x = b.conv2d(x, 16, 3, name="c0", activation="relu")
    b.conv2d(x, 16, 3, name="c1", activation="relu")
    g = b.build()
    g.infer_shapes(batch_size=1)
    nodes = [g.nodes["c0"], g.nodes["c1"]]
    for dtype in (jnp.float32, jnp.bfloat16):
        _params, specs = build_chain(nodes, 4, dtype, allow_2d_head=False)
        ct = _c_tile(jnp.dtype(dtype))
        assert specs[0].c_pad % ct == 0 and specs[0].c_pad == max(ct, 4)
        assert all(s.o_pad % ct == 0 for s in specs), (dtype, specs)


@pytest.mark.parametrize(
    "n,h,w,cin,e,cout,has_expand,residual",
    [
        (1, 14, 14, 32, 192, 32, True, True),
        (2, 14, 14, 32, 192, 32, True, True),   # multi-image guards
        (4, 7, 7, 48, 288, 48, True, True),     # wp jumps 7 -> 16
        (1, 12, 12, 32, 32, 16, False, False),  # t=1 path stores x padded
        (2, 16, 16, 24, 144, 40, True, False),
    ],
)
@pytest.mark.parametrize("row_chunk", [0, 8])
def test_kernel_vs_oracle_padded(n, h, w, cin, e, cout, has_expand, residual,
                                 row_chunk):
    """Padded-pitch layout (VERDICT r4 #5): zero guards replace border
    masks; must match the same oracle exactly — whole-plane and
    row-chunked dw+project variants."""
    import dataclasses

    rng = np.random.RandomState(1)
    x = rng.randn(n, h, w, cin).astype(np.float32)
    w1 = (rng.randn(cin, e) * 0.2).astype(np.float32) if has_expand else None
    wd = (rng.randn(9, e if has_expand else cin) * 0.2).astype(np.float32)
    w2 = (rng.randn(e if has_expand else cin, cout) * 0.2).astype(np.float32)
    e_ch = e if has_expand else cin

    spec = InvResSpec(
        h=h, w=w, cin=cin, e=e_ch, cout=cout, has_expand=has_expand,
        residual=residual, act_expand="relu6" if has_expand else "linear",
        act_dw="relu6", act_out="linear", padded=True, row_chunk=row_chunk,
    )
    got = fused_invres_block(
        jnp.asarray(x),
        None if w1 is None else jnp.asarray(w1),
        None if w1 is None else jnp.ones(e_ch),
        None if w1 is None else jnp.zeros(e_ch),
        jnp.asarray(wd), jnp.ones(e_ch), jnp.zeros(e_ch),
        jnp.asarray(w2), jnp.ones(cout), jnp.zeros(cout),
        spec, interpret=True,
    )
    assert got is not None
    want = _oracle(jnp.asarray(x),
                   None if w1 is None else jnp.asarray(w1),
                   jnp.asarray(wd), jnp.asarray(w2), residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
