"""Explicit shard_map SPMD executor tests (parallel/spmd.py).

Round-1 gaps these pin down (VERDICT.md):
- TP must actually shard the model axis even when SP is active (round 1
  silently forced tp=1 whenever spatial>1).
- Pallas kernels must survive sharding (round 1 dropped them for any
  sharded graph).
- Sharded-vs-single equivalence at a large frame (the whole point of SP).
"""

import dataclasses

import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

import oracle
from shadernn_tpu.config import BackendKind, EngineOptions, Precision, ShardingOptions
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.models import build_model
from shadernn_tpu.parallel.mesh import make_mesh
from shadernn_tpu.parallel.spmd import plan_spmd

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _single(name, x, precision=Precision.FP32, **kw):
    g = build_model(name, **kw)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=x.shape[0], precision=precision)
    )
    return np.asarray(eng.run_single(x))


def test_tp_shards_model_axis_under_sp(rng):
    """The round-1 failure mode: spatial>1 used to force tp=1. Assert the
    compiled params really carry the model axis while spatial is active."""
    sh = ShardingOptions(data=2, model=2, spatial=2)
    mesh = make_mesh(sh)
    g = build_model("espcn", h=32, w=32)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=4, sharding=sh), mesh=mesh
    )
    plan = eng.model.spmd_plan
    assert plan.summary()["tp_sharded"] >= 2  # conv_1/conv_2 (C_out=16 % 2)
    model_axis_leaves = [
        (node, k)
        for node, d in eng.model.params.items()
        for k, v in d.items()
        if "model" in (v.sharding.spec if hasattr(v.sharding, "spec") else P())
    ]
    assert model_axis_leaves, "no param is sharded on the model axis"
    # And SP is simultaneously active: conv nodes run in halo_conv mode.
    assert plan.summary().get("halo_conv", 0) >= 3

    x = rng.random((4, 32, 32, 1), dtype=np.float32)
    want = _single("espcn", x, h=32, w=32)
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "tp-under-sp")


def test_sharded_large_frame_equivalence(rng):
    """SP at a 1080-row frame (the large-frame use case SP exists for)."""
    x = rng.random((1, 1080, 64, 1), dtype=np.float32)
    want = _single("espcn", x, h=1080, w=64)
    sh = ShardingOptions(data=1, model=2, spatial=4)
    mesh = make_mesh(sh)
    g = build_model("espcn", h=1080, w=64)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=1, sharding=sh), mesh=mesh
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "sp-1080p")


def test_pallas_kernels_survive_sharding(rng, monkeypatch):
    """Forced-PALLAS sharded run (interpret mode on CPU) must match the
    single-device XLA result — the kernels run per-shard inside shard_map."""
    monkeypatch.setenv("SNN_AUTO_PALLAS_ANYWHERE", "1")
    x = rng.random((2, 16, 32, 1), dtype=np.float32)
    want = _single("espcn", x, h=16, w=32)
    sh = ShardingOptions(data=1, model=1, spatial=2)
    mesh = make_mesh(sh)
    g = build_model("espcn", h=16, w=32)
    eng = Engine.from_graph(
        g,
        EngineOptions(batch_size=2, sharding=sh, backend=BackendKind.PALLAS),
        mesh=mesh,
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "pallas-under-sp")


def test_mobilenet_sharded_dw_tp_and_gap(rng):
    """Depthwise TP (input-channel slice + O-shard) and the psum'd global
    average pool under DP x TP."""
    sh = ShardingOptions(data=2, model=4, spatial=1)
    mesh = make_mesh(sh)
    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    want = _single("mobilenetv2", x, h=64, w=64)
    g = build_model("mobilenetv2", h=64, w=64)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=2, sharding=sh), mesh=mesh
    )
    got = np.asarray(eng.run_single(x))
    # logits through softmax: compare distributions tightly
    oracle.compare(got, want, 1e-4, "mobilenet-dp-tp")


def test_mobilenet_spatial_sharded(rng):
    """MobileNet under SP: strided convs use halo exchange; pools and the
    flatten head fall back to gather where the planner says so."""
    sh = ShardingOptions(data=1, model=2, spatial=2)
    mesh = make_mesh(sh)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    want = _single("mobilenetv2", x, h=64, w=64)
    g = build_model("mobilenetv2", h=64, w=64)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=1, sharding=sh), mesh=mesh
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "mobilenet-sp")


def test_styletransfer_instancenorm_sp(rng):
    """InstanceNorm statistics are psum'd over the spatial axis; deconvs
    gather-fallback. End-to-end equivalence under SP."""
    sh = ShardingOptions(data=1, model=1, spatial=4)
    mesh = make_mesh(sh)
    x = rng.random((1, 64, 48, 3), dtype=np.float32)
    want = _single("styletransfer", x, h=64, w=48)
    g = build_model("styletransfer", h=64, w=48)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=1, sharding=sh), mesh=mesh
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "styletransfer-sp")


def test_int8_sharded(rng):
    """INT8 weight-only quantization under mixed sharding: dequant scales
    are O-sharded alongside the weights."""
    sh = ShardingOptions(data=2, model=2, spatial=2)
    mesh = make_mesh(sh)
    x = rng.random((4, 32, 32, 1), dtype=np.float32)
    want = _single("espcn", x, precision=Precision.INT8, h=32, w=32)
    g = build_model("espcn", h=32, w=32)
    eng = Engine.from_graph(
        g,
        EngineOptions(batch_size=4, precision=Precision.INT8, sharding=sh),
        mesh=mesh,
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-2, "int8-sharded")


def test_yolo_head_gather_fallback(rng):
    """Detection model: the YOLO decode needs full-frame coordinates, so the
    planner gathers; everything upstream stays sharded."""
    sh = ShardingOptions(data=1, model=1, spatial=2)
    mesh = make_mesh(sh)
    x = rng.random((1, 128, 128, 3), dtype=np.float32)
    want = _single("yolov3-tiny", x, h=128, w=128)
    g = build_model("yolov3-tiny", h=128, w=128)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=1, sharding=sh), mesh=mesh
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "yolo-sp")


def test_plan_modes_are_static():
    """The planner is a pure function of (graph, options): assert the mode
    decisions for a mixed mesh on ESPCN."""
    g = build_model("espcn", h=32, w=32)
    opts = EngineOptions(
        batch_size=4, sharding=ShardingOptions(data=2, model=2, spatial=2)
    )
    from shadernn_tpu.graph import fusion

    fusion.optimize(g)
    g.infer_shapes(batch_size=4)
    plan = plan_spmd(g, opts)
    modes = {n: p.mode for n, p in plan.nodes.items()}
    assert modes["input"] == "input"
    assert all(
        p == "halo_conv" for n, p in modes.items() if n.startswith("conv")
    ), modes
    # Subpixel is a pure per-row expansion: stays local & H-sharded.
    assert modes["subpixel"] == "local"
    assert plan.out_state["subpixel"]


def test_gspmd_baseline_still_works(rng):
    """The GSPMD auto-partitioning path stays available as a cross-check."""
    sh = ShardingOptions(data=2, model=1, spatial=1)
    mesh = make_mesh(sh)
    x = rng.random((4, 16, 32, 1), dtype=np.float32)
    want = _single("espcn", x, h=16, w=32)
    g = build_model("espcn", h=16, w=32)
    eng = Engine.from_graph(
        g,
        EngineOptions(batch_size=4, sharding=sh, spmd_mode="gspmd"),
        mesh=mesh,
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "gspmd-dp")


def test_depthwise_gather_fallback_drops_tp(rng):
    """Review finding: a SeparableConv2D forced into gather mode (H does
    not divide sp) must drop TP too — the generic gather branch runs with
    FULL-channel input, which cannot consume O-sharded depthwise weights
    (feature_group_count mismatch -> trace error)."""
    from shadernn_tpu.graph.builder import GraphBuilder

    def build():
        b = GraphBuilder("dwgather", seed=5)
        x = b.input(32, 32, 8, name="in")
        x = b.conv2d(x, 8, 3, name="c0", activation="relu")
        # valid padding: H_out = 30, not divisible by spatial=4 -> the dw
        # itself (not its producer) falls back to gather mode
        x = b.depthwise(x, 3, padding="valid", name="dw")
        b.conv2d(x, 8, 1, name="head")
        return b.build()

    sh = ShardingOptions(data=1, model=2, spatial=4)
    mesh = make_mesh(sh)
    eng = Engine.from_graph(
        build(), EngineOptions(batch_size=2, sharding=sh), mesh=mesh
    )
    plan = eng.model.spmd_plan
    assert plan.nodes["dw"].mode == "gather"
    assert not plan.nodes["dw"].tp

    x = rng.random((2, 32, 32, 8), dtype=np.float32)
    got = np.asarray(eng.run_single(x))
    g2 = build()
    ref = Engine.from_graph(g2, EngineOptions(batch_size=2))
    want = np.asarray(ref.run_single(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_upsample_gathers_under_sp(rng):
    """Review finding: bilinear UpSampling2D mixes rows across shard seams;
    running it shard-local silently corrupts seam rows. The planner must
    gather (nearest stays shard-local)."""
    from shadernn_tpu.graph.builder import GraphBuilder

    def build(interp):
        b = GraphBuilder(f"ups_{interp}", seed=6)
        x = b.input(32, 32, 4, name="in")
        x = b.conv2d(x, 4, 3, name="c0", activation="relu")
        b.upsample(x, 2, interpolation=interp, name="up")
        return b.build()

    sh = ShardingOptions(data=1, model=1, spatial=4)
    mesh = make_mesh(sh)
    for interp in ("bilinear", "nearest"):
        eng = Engine.from_graph(
            build(interp), EngineOptions(batch_size=2, sharding=sh), mesh=mesh
        )
        plan = eng.model.spmd_plan
        if interp == "bilinear":
            assert plan.nodes["up"].mode == "gather", plan.nodes["up"]
        else:
            assert plan.nodes["up"].mode == "local"
        x = rng.random((2, 32, 32, 4), dtype=np.float32)
        got = np.asarray(eng.run_single(x))
        ref = Engine.from_graph(build(interp), EngineOptions(batch_size=2))
        want = np.asarray(ref.run_single(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=interp)


def test_pool_halo_seam_correct(rng):
    """Fill-value pooling halos: max (-inf fill) and count-correct avg
    stay shard-local under SP and match the single-device result exactly
    at shard seams (values that straddle the boundary) and frame edges."""
    from shadernn_tpu.graph.builder import GraphBuilder
    from shadernn_tpu.parallel.spmd import plan_spmd

    def build():
        b = GraphBuilder("poolnet")
        x = b.input(32, 16, 3, name="input")
        x = b.conv2d(x, 8, 3, activation="relu", name="c1")
        x = b.maxpool(x, 2, stride=2, name="mp")      # seam at 32/4 rows
        x = b.conv2d(x, 8, 3, activation="relu", name="c2")
        # overlapping windows + same-pad: count-correct frame edges
        x = b.avgpool(x, 3, stride=1, padding="same", name="ap")
        b.conv2d(x, 4, 3, name="out")
        return b.build()

    # adversarial values at the seam rows: large magnitudes both signs
    x = rng.standard_normal((1, 32, 16, 3)).astype(np.float32) * 3

    want = np.asarray(
        Engine.from_graph(build(), EngineOptions(batch_size=1)).run_single(x)
    )
    sh = ShardingOptions(data=1, model=1, spatial=4)
    g = build()
    plan = plan_spmd(g, EngineOptions(batch_size=1, sharding=sh))
    assert plan.nodes["mp"].mode == "pool_halo", plan.nodes["mp"].mode
    assert plan.nodes["ap"].mode == "pool_halo", plan.nodes["ap"].mode
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=1, sharding=sh), mesh=make_mesh(sh)
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-5, "pool-halo-sp")
