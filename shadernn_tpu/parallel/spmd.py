"""Explicit shard_map SPMD executor: TP + SP + DP that keep the kernels.

Round-1 sharding ran the whole graph through GSPMD (parallel/sharding.py),
which had two costs: a jax-0.9 GSPMD miscompile forced TP off whenever the
spatial axis was active, and Pallas kernels (not GSPMD-partitionable) were
dropped for every sharded graph. This module replaces that with an explicit
`jax.shard_map` program planned per node:

- **DP**: input frames sharded on batch (`data` axis); every op is
  batch-local.
- **TP**: conv/dense weights sharded on the output-channel axis (`model`).
  This is ShaderNN's MRT per-pass output-channel chunking
  (reference core/src/ic2/conv2dGL.cpp:841-860) lifted from "multiple
  passes on one GPU" to "chips in a mesh": each chip computes its O-shard
  (with the bias/BN/dequant epilogue, all O-sharded) and an `all_gather`
  over the model axis reconstitutes full channels — the explicit form of
  the pass loop the shader codegen implied. Depthwise convs shard both the
  input-channel slice and the per-channel weights.
- **SP**: activations sharded on H (`spatial` axis). Convs exchange their
  receptive-field halo rows with `ppermute` neighbors
  (parallel/halo.py) — stride-1 same-geometry convs use the overlapped
  interior/border split (`halo_conv2d_shard`), strided convs use
  exchange-then-convolve. Ops with no spatial mixing run shard-local;
  ops that genuinely need the full frame (Flatten/Dense heads, YOLO
  decode) `all_gather` H and re-split afterwards when divisible.

Because each shard's body is an ordinary single-device program, the Pallas
conv kernels run unchanged inside it — sharded graphs keep the fused
kernels the GSPMD path had to drop.

Planning is static (shapes are known), execution is a plain env walk, so
the whole thing jits into one XLA program with explicit collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadernn_tpu.config import BackendKind, EngineOptions, Precision, ShardingOptions
from shadernn_tpu.graph.ir import Graph, Node
from shadernn_tpu.ops.common import apply_activation, padding_offsets
from shadernn_tpu.ops.registry import RunCtx, canonical_op, get_op
from shadernn_tpu.parallel.halo import halo_conv2d_shard, halo_exchange
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.spmd")

# Ops whose trailing-dim params are output channels shardable over `model`.
_TP_OPS = ("Conv2D", "Conv2DTranspose", "Dense")
# Param leaves with a trailing output-channel dim (same vocabulary as the
# conv epilogue: weight, int8 scales, bias, folded/unfolded BN vectors).
_O_PARAMS = ("weight", "weight_q", "weight_scale", "bias",
             "bn_gamma", "bn_beta", "bn_mean", "bn_variance")


@dataclasses.dataclass
class NodePlan:
    """Static per-node execution decision."""

    mode: str  # input | local | halo_conv | dw_conv | pool_halo | gather | instnorm | gap | dense
    tp: bool = False  # params sharded on the model axis
    halo_up: int = 0
    halo_dn: int = 0
    # Re-split H over `spatial` after a gather-mode op (output H divides).
    resplit: bool = False
    # Inputs that must be gathered first because their states disagree.
    gather_inputs: bool = False


@dataclasses.dataclass
class SpmdPlan:
    """Whole-graph plan: node decisions + partition specs."""

    nodes: Dict[str, NodePlan]
    out_state: Dict[str, bool]  # node name -> H-sharded?
    param_specs: Dict[str, Dict[str, P]]
    input_specs: Dict[str, P]
    output_specs: Dict[str, P]

    def summary(self) -> Dict[str, int]:
        modes: Dict[str, int] = {}
        for p in self.nodes.values():
            modes[p.mode] = modes.get(p.mode, 0) + 1
        modes["tp_sharded"] = sum(1 for p in self.nodes.values() if p.tp)
        return modes


def _divides(dim: int, ways: int) -> bool:
    return ways > 1 and dim % ways == 0


def _conv_geometry(node: Node, h_in: int, h_out: int, sp: int):
    """Halo geometry for an H-sharded conv/depthwise, or None if the shard
    decomposition doesn't line up (then the planner falls back to gather).

    Output row j of the global conv reads input rows [j*s - pt, j*s - pt + k):
    shard i owning output rows [i*h_out/sp, ...) needs `pt` rows from its
    upper neighbor and `max(0, k - s - pt)` from its lower one; edge shards
    receive zeros = the conv's zero padding (reference padding semantics,
    conv2d.cpp:69-105)."""
    k = int(node.attr("kernel_size"))
    st = int(node.attr("stride", 1))
    pt, pb, _, _ = padding_offsets(node.attr("padding", "same"), k)
    if not (_divides(h_in, sp) and _divides(h_out, sp)):
        return None
    h_l, ho_l = h_in // sp, h_out // sp
    if h_l % st != 0 or ho_l * st != h_l:
        return None  # shard boundaries don't align with the stride grid
    up, dn = pt, max(0, k - st - pt)
    if up > h_l or dn > h_l:
        return None  # ppermute only reaches immediate neighbors
    # The local VALID conv on (up + h_l + dn) rows must yield exactly ho_l.
    if (up + h_l + dn - k) // st + 1 != ho_l:
        return None
    return up, dn


def plan_spmd(graph: Graph, options: EngineOptions) -> SpmdPlan:
    """Static planning pass: walk the sorted graph propagating the
    "is H sharded over `spatial`?" state and pick each node's mode."""
    sh = options.sharding
    sp, tp, dp = sh.spatial, sh.model, sh.data
    order = graph.toposort()

    nodes: Dict[str, NodePlan] = {}
    state: Dict[str, bool] = {}
    param_specs: Dict[str, Dict[str, P]] = {}
    input_specs: Dict[str, P] = {}

    def tp_spec(node: Node) -> Dict[str, P]:
        o = node.out_spec.c if node.out_spec.rank == 4 else node.out_spec.shape[-1]
        specs = {}
        for k, v in node.params.items():
            v = np.asarray(v)
            if k in _O_PARAMS and v.shape[-1] == o:
                specs[k] = P(*([None] * (v.ndim - 1) + [sh.model_axis]))
            else:
                specs[k] = P()
        return specs

    for node in order:
        if node.op == "InputLayer":
            shape = node.out_spec.shape
            parts: List[Optional[str]] = [None] * len(shape)
            if _divides(shape[0], dp):
                parts[0] = sh.data_axis
            h_sh = len(shape) == 4 and _divides(shape[1], sp)
            if h_sh:
                parts[1] = sh.spatial_axis
            input_specs[node.name] = P(*parts)
            state[node.name] = h_sh
            nodes[node.name] = NodePlan(mode="input")
            continue

        in_states = [state[i] for i in node.inputs]
        h_sh = any(in_states)
        mismatch = h_sh and not all(in_states)
        plan = NodePlan(mode="local", gather_inputs=mismatch)
        if mismatch:
            h_sh = False  # reconcile by gathering all inputs

        op = canonical_op(node.op)
        out = node.out_spec
        if op in ("Conv2D",) and node.out_spec.rank == 4:
            plan.tp = _divides(out.c, tp) and all(
                np.asarray(v).shape[-1] == out.c
                for k, v in node.params.items() if k in _O_PARAMS
            )
            if h_sh:
                in_spec = graph.nodes[node.inputs[0]].out_spec
                geo = _conv_geometry(node, in_spec.h, out.h, sp)
                if geo is not None:
                    plan.mode, (plan.halo_up, plan.halo_dn) = "halo_conv", geo
                else:
                    plan.mode, h_sh = "gather", False
        elif op == "SeparableConv2D":
            in_spec = graph.nodes[node.inputs[0]].out_spec
            plan.tp = _divides(in_spec.c, tp) and _divides(out.c, tp)
            if h_sh:
                geo = _conv_geometry(node, in_spec.h, out.h, sp)
                if geo is not None:
                    plan.mode, (plan.halo_up, plan.halo_dn) = "dw_conv", geo
                else:
                    # The generic gather branch runs the op with FULL-channel
                    # input, which cannot consume O-sharded depthwise weights
                    # (feature_group_count mismatch) — drop TP here too.
                    plan.mode, h_sh, plan.tp = "gather", False, False
            else:
                plan.mode = "dw_conv"
        elif op == "Conv2DTranspose":
            plan.tp = _divides(out.c, tp)
            if h_sh:
                plan.mode, h_sh = "gather", False  # strided upsample mixes rows
        elif op == "Dense":
            plan.mode = "dense"
            plan.tp = _divides(int(node.attr("units")), tp)
            if h_sh:  # image input straight into Dense: need full H locally
                plan.gather_inputs = True
            h_sh = False
        elif op in ("MaxPooling2D", "AveragePooling2D"):
            if h_sh:
                in_spec = graph.nodes[node.inputs[0]].out_spec
                geo = _conv_geometry(node, in_spec.h, out.h, sp)
                if geo is not None:
                    # Fill-value halo exchange keeps pools shard-local:
                    # max exchanges with -inf frame-edge fill, avg
                    # exchanges a validity mask for count-correct means
                    # (zeros from off-mesh are exactly "excluded"). A
                    # full-H all_gather per pool — the previous behavior —
                    # is what pooling-heavy nets (ResNet18/U-Net) paid.
                    plan.mode, (plan.halo_up, plan.halo_dn) = "pool_halo", geo
                else:
                    plan.mode, h_sh = "gather", False
        elif op == "AdaptiveAvgPool2d":
            oh = int(node.attr("output_height", node.attr("output_size", 1)))
            ow = int(node.attr("output_width", node.attr("output_size", 1)))
            if h_sh:
                if oh == 1 and ow == 1:
                    plan.mode, h_sh = "gap", False  # psum'd: replicated out
                else:
                    plan.mode, h_sh = "gather", False
        elif op in ("InstanceNormalization",):
            if h_sh:
                plan.mode = "instnorm"
        elif op == "UpSampling2D":
            # Nearest upsampling is pure per-row expansion; BILINEAR mixes
            # rows across shard seams (each shard's jax.image.resize would
            # edge-clamp at its local boundary -> silently wrong seams).
            interp = str(node.attr("interpolation", "nearest")).lower()
            if h_sh and interp not in ("nearest", "nearest_neighbor"):
                plan.mode, h_sh = "gather", False
        elif op == "Subpixel":
            pass  # pure per-row expansion: shard-local under SP
        elif op == "SpaceToDepth":
            if h_sh:
                in_spec = graph.nodes[node.inputs[0]].out_spec
                r = int(node.attr("scale", 2))
                if (in_spec.h // sp) % r != 0:
                    plan.mode, h_sh = "gather", False
        elif op in ("ZeroPadding2D", "Pad", "Padding"):
            from shadernn_tpu.ops.shape_ops import Pad as _PadOp

            t, b, _, _ = _PadOp._pads(node)
            if h_sh and (t or b):
                plan.mode, h_sh = "gather", False
        elif op in ("Flatten", "YOLO"):
            if h_sh:
                plan.mode, h_sh = "gather", False
        elif op in ("Add", "Concatenate", "Activation", "Unary", "Calculate",
                    "BatchNormalization"):
            pass  # elementwise / per-channel: shard-local
        else:
            if h_sh:  # unknown op: be conservative
                plan.mode, h_sh = "gather", False

        # After a gather, re-split H if the output is an image that divides.
        if plan.mode == "gather" and out.rank == 4 and _divides(out.h, sp):
            plan.resplit = True
            h_sh = True

        if plan.tp and node.params:
            param_specs[node.name] = tp_spec(node)
        elif node.params:
            param_specs[node.name] = {k: P() for k in node.params}
        nodes[node.name] = plan
        state[node.name] = h_sh

    output_specs: Dict[str, P] = {}
    for name in graph.output_names:
        spec = graph.nodes[name].out_spec
        parts = [None] * spec.rank
        if _divides(spec.shape[0], dp):
            parts[0] = sh.data_axis
        if state[name]:
            parts[1] = sh.spatial_axis
        output_specs[name] = P(*parts)
    return SpmdPlan(nodes, state, param_specs, input_specs, output_specs)


# ---------------------------------------------------------------------------
# Execution


def _local_backend(node: Node, graph: Graph, options: EngineOptions) -> BackendKind:
    """Backend choice for the per-shard local program. Inside shard_map each
    shard is an ordinary single-device program, so the Pallas kernels are
    usable — resolve with sharding stripped."""
    from shadernn_tpu.engine.compile import resolve_backend

    local = dataclasses.replace(options, sharding=ShardingOptions())
    return resolve_backend(node, graph, local)


def _conv_local(node, x, ctx: RunCtx, stride: int, pads, use_pallas: bool,
                overlap_axis: Optional[str] = None):
    """One conv on local (already halo-extended) rows with explicit pads.

    The epilogue uses the folded per-channel (scale, offset) form so int8
    dequant, bias, and BN land in one multiply-add regardless of backend
    (the TPU analog of the reference's generated shader epilogue,
    conv2dGL.cpp:666-833)."""
    from shadernn_tpu.ops.conv import (
        _interpret_mode, epilogue_scale_offset, pallas_conv_supported,
    )

    scale, offset = epilogue_scale_offset(node)
    w = jnp.asarray(node.params.get("weight_q", node.params.get("weight")))
    act = node.attr("activation", "linear")
    alpha = float(node.attr("leaky_alpha", 0.3))
    if use_pallas and pallas_conv_supported(node, x.shape, x.dtype):
        from shadernn_tpu.kernels.conv_pallas import conv2d_pallas_nhwc

        wk = w if w.dtype == jnp.int8 else w.astype(x.dtype)
        return conv2d_pallas_nhwc(
            x, wk, scale, offset, stride=stride, pads=tuple(pads),
            activation=act, alpha=alpha, interpret=_interpret_mode(),
        )
    k = w.shape[0]
    pt, pb, pl_, pr = pads
    # int8 values are exact in bf16/f32; dequant is in the epilogue scale.
    wx = w.astype(x.dtype)
    if (
        overlap_axis is not None
        and stride == 1
        and pt + pb == k - 1
        and pt <= x.shape[1]
        and (k - 1 - pt) <= x.shape[1]
    ):
        # Overlapped halo conv: interior rows computed while the ppermute
        # is in flight (parallel/halo.py, the north-star mechanism).
        y = halo_conv2d_shard(
            x, wx, pads=(pt, pb, pl_, pr), axis_name=overlap_axis, overlap=True,
        )
    else:
        y = jax.lax.conv_general_dilated(
            x, wx, (stride, stride), ((pt, pb), (pl_, pr)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    y = y.astype(jnp.float32) * scale + offset
    return apply_activation(y, act, alpha).astype(x.dtype)


def build_spmd_forward(
    graph: Graph, options: EngineOptions, mesh: Mesh, plan: Optional[SpmdPlan] = None
):
    """Build (forward, plan): `forward(params, inputs)` is the global-array
    function (shard_map inside) ready for jit."""
    plan = plan or plan_spmd(graph, options)
    sh = options.sharding
    sp_ax, tp_ax = sh.spatial_axis, sh.model_axis
    order = graph.toposort()
    act_dtype = options.precision.activation_dtype

    from shadernn_tpu.engine.compile import _NodeView

    def gather_h(x):
        return jax.lax.all_gather(x, sp_ax, axis=1, tiled=True)

    def gather_c(x):
        return jax.lax.all_gather(x, tp_ax, axis=-1, tiled=True)

    def local_fn(params: Dict[str, Dict[str, jax.Array]], inputs: Dict[str, jax.Array]):
        env: Dict[str, jax.Array] = {}
        sp_idx = jax.lax.axis_index(sp_ax)
        tp_idx = jax.lax.axis_index(tp_ax)
        dumps: Dict[str, jax.Array] = {}

        for node in order:
            np_ = plan.nodes[node.name]
            if node.op == "InputLayer":
                env[node.name] = inputs[node.name].astype(act_dtype)
                continue
            view = _NodeView(node, params.get(node.name, {}))
            xs = [env[i] for i in node.inputs]
            if np_.gather_inputs or np_.mode == "gather":
                xs = [
                    gather_h(x) if plan.out_state[i] else x
                    for x, i in zip(xs, node.inputs)
                ]
            backend = _local_backend(node, graph, options)
            ctx = RunCtx(
                precision=options.precision, backend=backend,
                sharding=ShardingOptions(),
            )
            use_pallas = backend == BackendKind.PALLAS

            if np_.mode in ("local", "gather"):
                y = get_op(node.op).run(view, xs, ctx)
                if np_.tp:
                    y = gather_c(y)
                if np_.mode == "gather" and np_.resplit:
                    h_l = y.shape[1] // sh.spatial
                    y = jax.lax.dynamic_slice_in_dim(y, sp_idx * h_l, h_l, axis=1)
            elif np_.mode == "halo_conv":
                x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
                k = int(node.attr("kernel_size"))
                st = int(node.attr("stride", 1))
                _, _, pl_, pr = padding_offsets(node.attr("padding", "same"), k)
                if np_.halo_up or np_.halo_dn:
                    if st == 1 and not use_pallas:
                        # overlapped interior/border split inside _conv_local
                        pt = np_.halo_up
                        y = _conv_local(
                            view, x, ctx, st, (pt, k - 1 - pt, pl_, pr),
                            use_pallas=False, overlap_axis=sp_ax,
                        )
                    else:
                        xh = halo_exchange(x, np_.halo_up, np_.halo_dn, sp_ax)
                        y = _conv_local(view, xh, ctx, st, (0, 0, pl_, pr), use_pallas)
                else:
                    y = _conv_local(view, x, ctx, st, (0, 0, pl_, pr), use_pallas)
                if np_.tp:
                    y = gather_c(y)
            elif np_.mode == "dw_conv":
                x = xs[0]
                k = int(node.attr("kernel_size"))
                st = int(node.attr("stride", 1))
                pt, pb, pl_, pr = padding_offsets(node.attr("padding", "same"), k)
                from shadernn_tpu.ops.conv import epilogue_scale_offset

                # int8 values are exactly representable in bf16/f32; the
                # dequant scale is folded into the epilogue.
                w_raw = view.params.get("weight_q", view.params.get("weight"))
                w = jnp.asarray(w_raw).astype(x.dtype)
                scale, offset = epilogue_scale_offset(view)
                if np_.tp:
                    # weights arrive O-sharded = input-channel-block-sharded
                    # (feature groups follow input channels); slice the
                    # matching input channels locally.
                    c_l = x.shape[-1] // sh.model
                    x = jax.lax.dynamic_slice_in_dim(x, tp_idx * c_l, c_l, axis=-1)
                hs = plan.out_state[node.name]
                if hs and (np_.halo_up or np_.halo_dn):
                    x = halo_exchange(x, np_.halo_up, np_.halo_dn, sp_ax)
                    pads_v = (0, 0)
                elif hs:
                    pads_v = (0, 0)
                else:
                    pads_v = (pt, pb)
                y = jax.lax.conv_general_dilated(
                    x, w, (st, st), (pads_v, (pl_, pr)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=x.shape[-1],
                    preferred_element_type=jnp.float32,
                )
                y = y.astype(jnp.float32) * scale[None, None, None] + offset
                y = apply_activation(
                    y, node.attr("activation", "linear"),
                    float(node.attr("leaky_alpha", 0.3)),
                ).astype(act_dtype)
                if np_.tp:
                    y = gather_c(y)
            elif np_.mode == "pool_halo":
                x = xs[0]
                k = int(node.attr("kernel_size"))
                st = int(node.attr("stride", 1))
                _, _, pl_, pr = padding_offsets(node.attr("padding", "same"), k)
                hu, hd = np_.halo_up, np_.halo_dn
                strides = (1, st, st, 1)
                wdims = (1, k, k, 1)
                hpads = ((0, 0), (0, 0), (pl_, pr), (0, 0))
                if node.op.startswith("Max"):
                    neg = (
                        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                        else jnp.iinfo(x.dtype).min
                    )
                    xh = halo_exchange(x, hu, hd, sp_ax, fill=float(neg))
                    y = jax.lax.reduce_window(
                        xh, neg, jax.lax.max, wdims, strides, hpads
                    )
                else:  # count-correct average: exchange a validity mask
                    xh = halo_exchange(x, hu, hd, sp_ax)
                    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
                    oh_ = halo_exchange(ones, hu, hd, sp_ax)
                    sums = jax.lax.reduce_window(
                        xh, 0.0, jax.lax.add, wdims, strides, hpads
                    )
                    counts = jax.lax.reduce_window(
                        oh_, 0.0, jax.lax.add, wdims, strides, hpads
                    )
                    y = sums / counts
            elif np_.mode == "dense":
                x = xs[0]
                if x.ndim > 2:
                    x = x.reshape(x.shape[0], -1)
                from shadernn_tpu.ops.conv import epilogue_scale_offset

                scale, offset = epilogue_scale_offset(view)
                w = jnp.asarray(
                    view.params.get("weight_q", view.params.get("weight"))
                ).astype(x.dtype)
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                y = y * scale + offset
                if np_.tp:
                    # gather BEFORE the activation: softmax heads normalize
                    # over the full unit dim (reference CLASSIFICATION
                    # postprocess, core.cpp:228-238).
                    y = gather_c(y)
                y = apply_activation(
                    y, node.attr("activation", "linear"),
                    float(node.attr("leaky_alpha", 0.3)),
                ).astype(act_dtype)
            elif np_.mode == "instnorm":
                x = xs[0]
                eps = float(node.attr("epsilon", 1e-5))
                xf = x.astype(jnp.float32)
                h_total = x.shape[1] * sh.spatial
                cnt = h_total * x.shape[2]
                s1 = jax.lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), sp_ax)
                s2 = jax.lax.psum(jnp.sum(xf * xf, axis=(1, 2), keepdims=True), sp_ax)
                mean = s1 / cnt
                var = s2 / cnt - mean * mean
                y = (xf - mean) * jax.lax.rsqrt(var + eps)
                if "gamma" in view.params:
                    y = y * jnp.asarray(view.params["gamma"], jnp.float32)
                if "beta" in view.params:
                    y = y + jnp.asarray(view.params["beta"], jnp.float32)
                y = apply_activation(
                    y, node.attr("activation", "linear"),
                    float(node.attr("leaky_alpha", 0.3)),
                ).astype(act_dtype)
            elif np_.mode == "gap":
                x = xs[0]
                h_total = x.shape[1] * sh.spatial
                s = jax.lax.psum(
                    jnp.sum(x.astype(jnp.float32), axis=(1, 2), keepdims=True), sp_ax
                )
                y = (s / (h_total * x.shape[2])).astype(x.dtype)
            else:  # pragma: no cover - planner emits only the modes above
                raise AssertionError(f"unknown mode {np_.mode}")
            env[node.name] = y
            if options.dump_outputs:
                dumps[node.name] = (
                    gather_h(y) if plan.out_state[node.name] else y
                ).astype(jnp.float32)

        outs = {}
        for o in graph.output_names:
            outs[o] = env[o].astype(jnp.float32)
        if options.dump_outputs:
            outs["__dumps__"] = dumps
        return outs

    in_specs = (plan.param_specs, plan.input_specs)
    out_specs: Dict[str, P] = dict(plan.output_specs)
    if options.dump_outputs:
        out_specs["__dumps__"] = {
            n.name: (
                P(sh.data_axis)
                if _divides(n.out_spec.shape[0], sh.data)
                else P()
            )
            for n in order
            if n.op != "InputLayer"
        }

    fwd = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return fwd, plan


def shard_compiled_spmd(
    graph: Graph, options: EngineOptions, params, mesh: Mesh
):
    """Compile the explicit-SPMD program; returns a CompiledModel."""
    from shadernn_tpu.engine.compile import CompiledModel

    fwd, plan = build_spmd_forward(graph, options, mesh)
    logger.info("spmd plan: %s", plan.summary())

    def leaf_sharding(node_name, param_name):
        return NamedSharding(mesh, plan.param_specs[node_name][param_name])

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
        name: NamedSharding(mesh, plan.input_specs[name])
        for name in graph.input_names
    }
    step = jax.jit(
        fwd,
        in_shardings=(param_shardings, in_shardings),
        donate_argnums=(1,) if options.donate_input else (),
    )
    input_specs = {n: graph.nodes[n].out_spec.shape for n in graph.input_names}
    model = CompiledModel(graph, options, params, step, input_specs, fwd)
    model.spmd_plan = plan
    return model
