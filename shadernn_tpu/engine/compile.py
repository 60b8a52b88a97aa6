"""Graph -> jitted XLA executable.

TPU-native replacement for the reference "compile" path
(dp::generateInferenceGraph + MixedInferenceCore::init,
core/src/ic2/dp.cpp:169-382 and core/src/ic2/core.cpp:294-432): where the
reference generates + compiles one GLSL shader per layer and allocates
textures per render stage, here the whole DAG is traced into ONE function
and jit-compiled by XLA, which does the fusion the reference did by shader
codegen. Weights live in a params pytree (device-resident, shardable);
intermediate "textures" are XLA temporaries.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from shadernn_tpu.config import BackendKind, EngineOptions, Precision
from shadernn_tpu.graph.ir import Graph, Node
from shadernn_tpu.ops.common import ACTIVATIONS
from shadernn_tpu.ops.registry import RunCtx, get_op
from shadernn_tpu.utils import get_logger

log = get_logger("snn_tpu.compile")

Params = Dict[str, Dict[str, jax.Array]]


def extract_params(graph: Graph) -> Params:
    """Pull every node's weights into a pytree keyed by node name.

    The analog of the reference's per-pass weight upload
    (openGLRenderpass.cpp:130-634) — one device_put of the whole tree.
    """
    params: Params = {}
    for n in graph.nodes.values():
        if n.params:
            params[n.name] = {k: np.asarray(v) for k, v in n.params.items()}
    return params


@dataclasses.dataclass
class _NodeView:
    """Shallow node proxy whose params come from the traced pytree, so op
    bodies written against `node.params` see tracers under jit."""

    _node: Node
    params: Dict[str, jax.Array]

    @property
    def name(self):
        return self._node.name

    @property
    def op(self):
        return self._node.op

    @property
    def inputs(self):
        return self._node.inputs

    @property
    def attrs(self):
        return self._node.attrs

    @property
    def out_spec(self):
        return self._node.out_spec

    def attr(self, key: str, default=None):
        return self._node.attr(key, default)


def resolve_backend(node: Node, graph: Graph, options: EngineOptions) -> BackendKind:
    """Per-node backend choice — the TPU analog of the reference picking
    fragment vs compute shader per layer.

    AUTO policy, calibrated on v5e measurements (bench --all, bf16 b8):
    the NHCW Pallas kernel wins where XLA's 128-lane channel padding
    dominates — small-channel convs with meaningful spatial kernels.
    Measured: ESPCN (C<=16, k3/k5 chains) 3.2x faster; StyleTransfer
    k9 stems at 32ch 1.8x faster; 1x1 convs and 32-channel k3 convs were
    neutral-to-slower (kernel call + layout conversion overhead), so they
    stay on XLA.
    """
    configured = options.backend_for(node.name)
    if configured != BackendKind.AUTO:
        return configured
    if jax.default_backend() != "tpu" and not os.environ.get(
        "SNN_AUTO_PALLAS_ANYWHERE"
    ):
        # Off-TPU the Pallas kernels only run in interpret mode (test-only,
        # orders of magnitude slower) — AUTO means XLA there. Tests that
        # want the interpret path set SNN_AUTO_PALLAS_ANYWHERE=1 or request
        # BackendKind.PALLAS explicitly.
        return BackendKind.XLA
    if options.sharding.is_sharded:
        # Pallas kernels are not GSPMD-partitionable; sharded graphs stay
        # on XLA (the explicit shard_map halo path is separate).
        return BackendKind.XLA
    if node.op == "Conv2D" and len(node.inputs) == 1:
        from shadernn_tpu.ops.conv import pallas_chain_supported

        cin = graph.nodes[node.inputs[0]].out_spec.c
        cout = int(node.attr("out_channels"))
        k = int(node.attr("kernel_size"))
        wide = max(cin, cout)
        if pallas_chain_supported(node, cin) and (
            (k >= 5 and wide <= 32) or (2 <= k <= 4 and wide <= 16)
        ):
            return BackendKind.PALLAS
    return BackendKind.XLA


def build_forward(
    graph: Graph, options: EngineOptions
) -> Callable[[Params, Dict[str, jax.Array]], Dict[str, jax.Array]]:
    """Build the pure forward function over (params, inputs).

    Returns all graph outputs; with options.dump_outputs, returns every
    layer's activation as well (the analog of the reference --dump_outputs
    path, openGLRenderpass.cpp:764-899, used by the layer-dump validation
    harness).
    """
    order = graph.toposort()
    act_dtype = options.precision.activation_dtype
    # Output dtype: f32 by default (reference-parity convenience); frame
    # pipelines set output_dtype="activation" to skip the f32 upcast +
    # layout copy of the LARGEST tensor (e.g. ESPCN 1080p output: ~500us
    # of convert/copy on a 2.0ms model — the reference likewise hands the
    # consumer fp16 textures, not fp32).
    out_dtype = (
        act_dtype
        if options.output_dtype in ("activation", None)
        else jnp.dtype(options.output_dtype)
    )

    # --- pallas chain planning (static) -----------------------------------
    # A chain is a maximal run of stride-1 pallas Conv2D nodes linked
    # producer->sole-consumer. Runs of length >= 2 execute as ONE fused
    # pallas kernel (kernels/chain_pallas.py) with intermediates living in
    # VMEM only; singletons use the per-conv haloed kernel. Chain fusion is
    # disabled under dump_outputs (intermediates must be observable) and
    # under SPMD sharding.
    def _chain_eligible(node: Node) -> bool:
        from shadernn_tpu.ops.conv import pallas_chain_supported

        return (
            node.op == "Conv2D"
            and len(node.inputs) == 1
            and resolve_backend(node, graph, options) == BackendKind.PALLAS
            and pallas_chain_supported(node, graph.nodes[node.inputs[0]].out_spec.c)
        )

    chains: Dict[str, list] = {}
    skip_names: set = set()
    if options.sharding.total_devices == 1 and not options.dump_outputs:
        visited = set()
        for node in order:
            if node.name in visited or not _chain_eligible(node):
                continue
            run = [node]
            visited.add(node.name)
            while run[-1].name not in graph.output_names:
                consumers = graph.consumers(run[-1].name)
                if len(consumers) != 1:
                    break
                nxt = consumers[0]
                if not (_chain_eligible(nxt) and nxt.inputs == [run[-1].name]):
                    break
                run.append(nxt)
                visited.add(nxt.name)
            if len(run) >= 2:
                # Tail fusion: o=1 heads write 2D rows ("c1"); o=4 heads
                # feeding a sole-consumer Subpixel(2) absorb the
                # depth_to_space into the kernel ("d2s2"). Both skip the
                # NHCW o_pad write amplification on the largest tensor.
                tail, tail_node = "none", None
                last = run[-1]
                o_last = int(last.attr("out_channels"))
                if o_last == 1:
                    tail = "c1"
                elif o_last == 4 and act_dtype == jnp.bfloat16:
                    consumers = graph.consumers(last.name)
                    if (
                        last.name not in graph.output_names
                        and len(consumers) == 1
                        and consumers[0].op == "Subpixel"
                        and int(consumers[0].attr("scale", 2)) == 2
                    ):
                        tail, tail_node = "d2s2", consumers[0]
                # Elementwise-activation folding: a sole-consumer Activation
                # node after the tail (e.g. ESPCN's post-subpixel tanh_out)
                # runs in the kernel's f32 epilogue instead of as a separate
                # full-resolution XLA pass over the LARGEST tensor (measured:
                # ~240us of the 410us non-kernel time at 1080p b8).
                # Elementwise acts commute with depth_to_space.
                act_node = None
                end = tail_node if tail_node is not None else last
                if tail != "none" and end.name not in graph.output_names:
                    cons = graph.consumers(end.name)
                    # Foldable = every elementwise activation the op layer
                    # knows (ops/common.py ACTIVATIONS) minus the two that
                    # aren't a per-element epilogue (softmax reduces over
                    # channels; linear is a no-op), plus the spelling
                    # variants apply_activation accepts. Derived, not
                    # restated, so a new activation in ACTIVATIONS folds
                    # automatically.
                    foldable = tuple(
                        a for a in ACTIVATIONS if a not in ("softmax", "linear")
                    ) + ("leakyrelu", "leaky relu")
                    if (
                        len(cons) == 1
                        and cons[0].op == "Activation"
                        and len(cons[0].inputs) == 1
                        and str(last.attr("activation", "linear")).lower()
                        in ("linear", "", "none", "identity")
                        # Mirror the Activation op's own attribute lookup
                        # (ops/elementwise.py:70): 'activation' first, then
                        # 'kind', defaulting to relu — a node specified via
                        # kind= folds identically to how it would run.
                        and str(
                            cons[0].attr("activation", cons[0].attr("kind", "relu"))
                        ).lower()
                        in foldable
                    ):
                        act_node = cons[0]
                chains[node.name] = (run, tail, tail_node, act_node)
                skip_names.update(n.name for n in run[1:])
                if tail_node is not None:
                    skip_names.add(tail_node.name)
                if act_node is not None:
                    skip_names.add(act_node.name)

    # --- fused inverted-residual block planning (static) -------------------
    # [expand 1x1] -> depthwise 3x3 s1 -> project 1x1 [-> residual Add] runs
    # as ONE pallas kernel (kernels/block_pallas.py), the expanded tensors
    # never touching HBM. Keyed by head node (expand, or dw when t=1).
    blocks: Dict[str, tuple] = {}
    if options.sharding.total_devices == 1 and not options.dump_outputs:
        from shadernn_tpu.kernels.block_pallas import match_invres_block

        def _invres_backend_ok(dw_node: Node) -> bool:
            configured = options.backend_for(dw_node.name)
            if configured == BackendKind.PALLAS:
                return True
            return configured == BackendKind.AUTO and (
                jax.default_backend() == "tpu"
                or bool(os.environ.get("SNN_AUTO_PALLAS_ANYWHERE"))
            )

        for node in order:
            if node.op != "SeparableConv2D" or not _invres_backend_ok(node):
                continue
            m = match_invres_block(graph, node, options)
            if m is None:
                continue
            expand, dw, project, add = m
            head = expand if expand is not None else dw
            members = [n for n in m if n is not None]
            if any(n.name in skip_names or n.name in chains for n in members):
                continue
            blocks[head.name] = m
            skip_names.update(n.name for n in members if n is not head)

    # (specs, h, w) per packed chain, recorded at trace time (keyed by head
    # so retraces don't duplicate) — bench.py computes the MXU-slot bound
    # roofline from these (chain_packed_pallas.mxu_slot_flops).
    packed_chain_specs: Dict[str, tuple] = {}
    block_specs: Dict[str, tuple] = {}  # fused invres: name -> (spec, batch)

    def _forward_impl(params: Params, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        from shadernn_tpu.kernels.chain_pallas import build_chain, fused_conv_chain
        from shadernn_tpu.kernels.conv_pallas import (
            HaloedValue, from_haloed, to_haloed,
        )
        from shadernn_tpu.ops.conv import _interpret_mode, conv_run_pallas_chain

        def nhwc(v):
            return from_haloed(v) if isinstance(v, HaloedValue) else v

        env: Dict[str, object] = {}
        for node in order:
            if node.name in skip_names:
                continue
            if node.op == "InputLayer":
                x = inputs[node.name]
                env[node.name] = x.astype(act_dtype)
                continue
            view = _NodeView(node, params.get(node.name, {}))
            xs = [env[i] for i in node.inputs]
            ctx = RunCtx(
                precision=options.precision,
                backend=resolve_backend(node, graph, options),
                sharding=options.sharding,
            )
            if node.name in blocks:
                from shadernn_tpu.kernels.block_pallas import (
                    build_invres, fused_invres_block,
                )

                expand, dw, project, add = blocks[node.name]
                views = [
                    _NodeView(n, params.get(n.name, {})) if n is not None else None
                    for n in (expand, dw, project, add)
                ]
                head = expand if expand is not None else dw
                in_node = graph.nodes[head.inputs[0]]
                in_spec = in_node.out_spec
                # A8W8 scales engage only under an INT8 engine (advisor
                # r3): a calibrated graph rebuilt at FP32/BF16 must run
                # float activations.
                from shadernn_tpu.config import Precision as _P

                _a8 = (float(in_node.attrs.get("act_scale", 0.0) or 0.0)
                       if options.precision == _P.INT8 else 0.0)
                built = build_invres(
                    views, in_spec, act_dtype, batch=in_spec.n,
                    in_act_scale=_a8,
                    a8w8=(options.precision == _P.INT8),
                )
                out_node = add if add is not None else project
                res = None
                if built is not None:
                    operands, spec = built
                    block_specs[node.name] = (spec, in_spec.n)
                    res = fused_invres_block(
                        nhwc(xs[0]), *operands, spec,
                        interpret=_interpret_mode(),
                    )
                if res is not None:
                    env[out_node.name] = res
                    continue
                # VMEM gate failed: run the member ops unfused on XLA.
                v = nhwc(xs[0])
                skip_in = v
                for nview in views:
                    if nview is None:
                        continue
                    if nview.op == "Add":
                        v = get_op("Add").run(nview, [skip_in, v], ctx)
                    else:
                        v = get_op(nview.op).run(nview, [v], ctx)
                env[out_node.name] = v
                continue
            if node.name in chains:
                run, tail, tail_node, act_node = chains[node.name]
                v = xs[0]
                views = [
                    _NodeView(n, params.get(n.name, {})) for n in run
                ]
                act_override = None
                if act_node is not None:
                    act_override = (
                        str(act_node.attr("activation", act_node.attr("kind", "relu"))),
                        float(act_node.attr("leaky_alpha", 0.3)),
                    )
                # Packed-column format first (kernels/chain_packed_pallas.py):
                # MXU-bound, no per-dot patch assembly. Falls back to the
                # im2col chain kernel when unsupported (mid-graph HaloedValue
                # inputs, odd-channel bf16, o>32, k>9) or when forced off.
                if (
                    options.chain_format in ("auto", "packed")
                    and tail in ("c1", "d2s2")
                    and not isinstance(v, HaloedValue)
                ):
                    from shadernn_tpu.kernels.chain_packed_pallas import (
                        build_chain_packed, fused_conv_chain_packed,
                    )

                    built_p = build_chain_packed(
                        views,
                        graph.nodes[node.inputs[0]].out_spec.c,
                        act_dtype,
                        act_override=act_override,
                        width=graph.nodes[node.inputs[0]].out_spec.w,
                        tail=tail,
                        a8=(
                            options.chain_a8 != "off"
                            and options.precision == Precision.INT8
                        ),
                    )
                    if built_p is None and options.chain_format == "packed":
                        log.warning(
                            "chain_format='packed' requested but chain at "
                            "%s is unsupported (stride/channel/kernel "
                            "gate); falling back to im2col", node.name,
                        )
                    if built_p is not None:
                        layer_params, pspecs = built_p
                        in_spec = graph.nodes[node.inputs[0]].out_spec
                        packed_chain_specs[node.name] = (
                            pspecs, in_spec.h, in_spec.w
                        )
                        # Feed the RAW model input when the chain head is
                        # fed straight by an InputLayer: pack_input folds
                        # the activation-dtype cast into its pad+transpose
                        # pass (an upfront cast costs a full extra memory
                        # pass over the frame).
                        vin = nhwc(v)
                        head_src = graph.nodes[node.inputs[0]]
                        if head_src.op == "InputLayer":
                            vin = inputs[head_src.name]
                        res = fused_conv_chain_packed(
                            vin, layer_params, pspecs,
                            interpret=_interpret_mode(), tail=tail,
                            compute_dtype=act_dtype,
                        )
                        env[run[-1].name] = res
                        if tail_node is not None:
                            env[tail_node.name] = res
                        if act_node is not None:
                            env[act_node.name] = res
                        continue
                built = build_chain(
                    views,
                    graph.nodes[node.inputs[0]].out_spec.c,
                    act_dtype,
                    allow_2d_head=not isinstance(v, HaloedValue),
                    act_override=act_override,
                )
                if built is not None:
                    layer_params, specs = built
                    if specs[0].c_pad != 0 and not isinstance(v, HaloedValue):
                        v = to_haloed(v)
                    res = fused_conv_chain(
                        v, layer_params, specs, interpret=_interpret_mode(),
                        tail=tail,
                    )
                    env[run[-1].name] = res
                    if tail_node is not None:  # d2s2 absorbed the Subpixel
                        env[tail_node.name] = res
                    if act_node is not None:  # folded into the epilogue
                        env[act_node.name] = res
                else:  # VMEM/geometry gate: fall back to per-conv kernels
                    for nview in views:
                        v = conv_run_pallas_chain(nview, v, ctx)
                    env[run[-1].name] = v
                    if tail_node is not None:  # run the Subpixel normally
                        sview = _NodeView(tail_node, params.get(tail_node.name, {}))
                        env[tail_node.name] = get_op("Subpixel").run(
                            sview, [nhwc(v)], ctx
                        )
                    if act_node is not None:  # run the Activation normally
                        aview = _NodeView(act_node, params.get(act_node.name, {}))
                        src = act_node.inputs[0]
                        env[act_node.name] = get_op("Activation").run(
                            aview, [nhwc(env[src])], ctx
                        )
                continue
            # Single haloed conv (chain of one)
            if (
                node.op == "Conv2D"
                and ctx.backend == BackendKind.PALLAS
                and len(xs) == 1
                and options.sharding.total_devices == 1
                and _chain_eligible(node)
            ):
                env[node.name] = conv_run_pallas_chain(view, xs[0], ctx)
                continue
            xs = [nhwc(v) for v in xs]
            env[node.name] = get_op(node.op).run(view, xs, ctx)
        outs = {o: nhwc(env[o]).astype(out_dtype) for o in graph.output_names}
        if options.dump_outputs:
            outs["__dumps__"] = {
                n.name: nhwc(env[n.name]).astype(jnp.float32)
                for n in order
                if n.op != "InputLayer"
            }
        return outs

    def forward(params: Params, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        if act_dtype == jnp.float32:
            # TPU MXU defaults to one bf16 pass even for f32 operands
            # (~1e-3 error). FP32 mode promises fp32-grade results (the
            # reference's fp32 shaders are exact), so trace every dot/conv
            # at HIGHEST (3-pass bf16x3) precision.
            with jax.default_matmul_precision("highest"):
                return _forward_impl(params, inputs)
        return _forward_impl(params, inputs)

    # Expose the static chain plan (head -> fused layer names) so the
    # in-situ trace profiler can attribute Pallas custom-call events to
    # layer chains (utils/trace_profile.py).
    forward.chain_plan = {
        head: [n.name for n in run]
        + ([tail_node.name] if tail_node else [])
        + ([act_node.name] if act_node else [])
        for head, (run, _tail, tail_node, act_node) in chains.items()
    }
    forward.block_plan = {
        head: [n.name for n in members if n is not None]
        for head, members in blocks.items()
    }
    forward.packed_chain_specs = packed_chain_specs
    forward.block_specs = block_specs
    return forward


@dataclasses.dataclass
class CompiledModel:
    """A model ready to run: graph + device params + jitted step.

    Analog of `MixedInferenceCore` (core/inc/snn/core.h:66-117) minus the
    per-stage machinery XLA subsumes.
    """

    graph: Graph
    options: EngineOptions
    params: Params
    step: Callable  # jitted (params, inputs) -> outputs
    input_specs: Dict[str, tuple]
    forward: Optional[Callable] = None  # unjitted forward, for bench wrappers

    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return self.step(self.params, inputs)

    def run_single(self, x) -> jax.Array:
        """Convenience: one input, first output."""
        (in_name,) = self.graph.input_names
        outs = self(
            {in_name: x if hasattr(x, "dtype") else jnp.asarray(x)}
        )
        return outs[self.graph.output_names[0]]


def compile_graph(
    graph: Graph,
    options: Optional[EngineOptions] = None,
    mesh=None,
) -> CompiledModel:
    """Shape-infer, extract params to device, and jit the forward step.

    `mesh` (a jax.sharding.Mesh) enables the SPMD path — see
    shadernn_tpu.parallel for weight/activation sharding rules.
    """
    options = options or EngineOptions()
    if any(n.out_spec is None for n in graph.nodes.values()):
        graph.infer_shapes(batch_size=options.batch_size)

    # A8W8: stamp consumers with their input activation scales (no-op
    # unless calibrate_activations ran and weights are int8).
    from shadernn_tpu.quant.calibrate import propagate_input_scales

    propagate_input_scales(graph)

    params = extract_params(graph)
    forward = build_forward(graph, options)

    if mesh is not None:
        if options.auto_output_layout:
            # Output layouts on the mesh path are dictated by the output
            # NamedShardings / shard_map results; Layout.AUTO applies only
            # to the single-device jit below. Say so once instead of
            # silently ignoring the option.
            log.warning(
                "auto_output_layout only applies to the single-device "
                "Engine path; ignored under a mesh (outputs take the "
                "sharding-dictated layout)."
            )
        from shadernn_tpu.parallel.sharding import shard_compiled

        return shard_compiled(graph, options, params, forward, mesh)

    params = jax.device_put(jax.tree.map(jnp.asarray, params))
    donate = (1,) if options.donate_input else ()
    jit_kwargs = {}
    if options.auto_output_layout:
        from jax.experimental.layout import Format, Layout

        jit_kwargs["out_shardings"] = Format(Layout.AUTO)
    if options.auto_input_layout:
        from jax.experimental.layout import Format, Layout

        # AUTO on the frame inputs only; params keep their resident
        # layout (an AUTO params layout would relayout the whole weight
        # set on every call whose committed layout disagrees).
        jit_kwargs["in_shardings"] = (None, Format(Layout.AUTO))
    step = jax.jit(forward, donate_argnums=donate, **jit_kwargs)
    input_specs = {
        n: graph.nodes[n].out_spec.shape for n in graph.input_names
    }
    return CompiledModel(graph, options, params, step, input_specs, forward)
