"""Fused inverted-residual block kernel: expand(1x1) -> depthwise(3x3,s1)
-> project(1x1) [-> residual add] as ONE pallas kernel.

MobileNetV2-style blocks (the reference zoo's MobileNetV2, whose depthwise
stages the reference runs through dedicated generated shaders —
separableconvolutionGL.cpp:523,715) are hostile to a layer-at-a-time
executor on TPU: the 1x1 convs are small matmuls whose intermediates are
6x wider than the block's input/output, so HBM traffic is dominated by the
expanded tensors, and the depthwise conv has no MXU contraction at all.
This kernel keeps the whole block in VMEM:

  read x tile            (P, Cin)    from HBM
  e  = relu6(x @ W1 * s1 + o1)       MXU, epilogue fused (P, E) in VMEM
  d  = relu6(dw3x3(e) * sd + od)     VPU, 9 shifted multiply-adds
  y  = d @ W2 * s2 + o2 [+ x]        MXU, residual fused
  write y tile           (P, Cout)   to HBM

HBM activation traffic collapses from ~ (2E + 2E + Cin + Cout) to
(Cin + Cout) words/pixel — ~7x on the t=6 blocks — and the three ops
become one kernel launch.

Layout: activations are flattened to 2D (P, C) with P = b*H*W pixels in
sublanes and channels in lanes, so both 1x1 convs are plain MXU dots with
M = P (whole-plane M, e.g. 3136 at 56x56 — no M-underutilization even for
tiny channel counts). The depthwise conv runs on the same flat buffer:
a tap (dy, dx) of a 3x3 stride-1 SAME conv is a shift of the flattened
pixel index by (dy-1)*W + (dx-1), with out-of-image contributions masked
by per-pixel row/col predicates (iota-derived, shared across taps).
The expanded tensor is written once into a guard-padded VMEM scratch and
the 9 taps read static slices of it — no halo DMA, no transposes.

Weight-only INT8 (quant/quantize.py) composes for free: the per-output-
channel dequant scale is already folded into each stage's epilogue scale,
so the kernel just upcasts the int8 weight tiles on entry.

Stride-2 blocks (4 of 17 in MobileNetV2) and non-k3 depthwise stay on the
XLA path; the planner only fuses stride-1 k3 blocks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shadernn_tpu.kernels.conv_pallas import _mxu_precision
from shadernn_tpu.ops.common import apply_activation


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class InvResSpec:
    """Static geometry of one fused block."""

    h: int
    w: int
    cin: int
    e: int  # expanded width (== cin when has_expand is False)
    cout: int
    has_expand: bool
    residual: bool
    act_expand: str
    act_dw: str
    act_out: str  # applied after the (optional) residual add
    alpha: float = 0.3
    b_tile: int = 1  # images per grid step
    # A8W8: calibrated activation scales (quant/calibrate.py act_scale
    # attrs). Non-zero + int8 weights => the 1x1 matmuls quantize their
    # activations in-kernel and run on the MXU's int8 path (2x bf16
    # throughput); the dequant folds into the existing epilogue scale.
    ax1: float = 0.0  # block-input scale (expand matmul)
    ax2: float = 0.0  # depthwise-output scale (project matmul)
    # Padded-pitch layout (VERDICT r4 #5, the row-chunked-dw lever): pixels
    # live at ((bi*(h+2) + r + 1)*wp + 1 + c) with wp = round_up(w+2, 8)
    # and ZERO guard rows/columns. The 9 dw taps then read offsets
    # (dy-1)*wp + (dx-1): the row component is sublane-ALIGNED (wp % 8
    # == 0, vs the flat layout's arbitrary +-w+-1 shifts) and no border
    # masks are needed at all — out-of-image taps read exact zeros. The
    # price is M inflation ((h+2)/h * wp/w) on both matmuls, so the
    # planner enables it only where the dw overhead dominates (large
    # spatial, narrow E), not on the MXU-bound 7x7/E>=960 blocks.
    padded: bool = False
    # Padded-layout refinement: process the dw + project in chunks of
    # this many pitch rows (0 = whole-plane). Each chunk's 9-tap
    # accumulator and dw output stay register/VMEM-local instead of
    # streaming two full (P, E) f32 temporaries through VMEM per stage;
    # the project dot runs per chunk at M = row_chunk*wp (>= 128 keeps
    # the MXU's M dim full).
    row_chunk: int = 0

    @property
    def wp(self) -> int:  # padded row pitch (sublane-aligned)
        return _round_up(self.w + 2, 8)

    @property
    def hp(self) -> int:  # padded rows per image (one guard row each side)
        return self.h + 2

    def p_tile(self) -> int:  # pixels per grid step in the kernel layout
        if self.padded:
            return self.b_tile * self.hp * self.wp
        return self.b_tile * self.h * self.w


def invres_vmem_bytes(spec: InvResSpec, b: int, itemsize: int) -> int:
    """VMEM footprint estimate (lane-padded) for b images per step."""
    if spec.padded:
        p = b * spec.hp * spec.wp
        guard = 2 * (spec.wp + 1)
    else:
        p = b * spec.h * spec.w
        guard = 2 * (spec.w + 1)

    def arr(rows, ch, isz):
        return _round_up(rows, 8) * _round_up(ch, 128) * isz

    x_io = 2 * arr(p, spec.cin, itemsize)  # double-buffered input blocks
    y_io = 2 * arr(p, spec.cout, itemsize)
    epad = arr(p + guard, spec.e, itemsize)
    acc = arr(p, spec.e, 4)  # f32 dw accumulator
    proj = arr(p, spec.cout, 4)
    return x_io + y_io + epad + acc + proj


def plan_b_tile(spec: InvResSpec, n: int, itemsize: int,
                vmem_budget: int = 48 << 20) -> int:
    """Largest images-per-grid-step under the VMEM budget. Mosaic needs the
    sublane block dim divisible by 8 unless the block covers the whole
    array (b == n). Returns 0 if nothing fits."""
    per_img = spec.hp * spec.wp if spec.padded else spec.h * spec.w
    b_tile = 0
    for b in range(1, n + 1):
        if n % b:
            continue
        if b != n and (b * per_img) % 8 != 0:
            continue
        if invres_vmem_bytes(spec, b, itemsize) <= vmem_budget:
            b_tile = b
    return b_tile


def _invres_kernel(
    x_ref,
    w1_ref,
    s1_ref,
    o1_ref,
    wd_ref,
    sd_ref,
    od_ref,
    w2_ref,
    s2_ref,
    o2_ref,
    out_ref,
    epad_ref,
    *,
    spec: InvResSpec,
    compute_dtype,
):
    h, w = spec.h, spec.w
    p = spec.p_tile()
    # margin rows above/below the live window of epad keep every tap
    # slice in-bounds; reads landing there only feed guard output
    # positions, which the caller slices away
    g = (spec.wp + 1) if spec.padded else (w + 1)

    x = x_ref[...]  # (P, Cin)

    def q8(v, scale):
        return jnp.clip(
            jnp.round(v.astype(jnp.float32) * (1.0 / scale)), -127, 127
        ).astype(jnp.int8)

    guard_mask = None
    if spec.padded:
        # 0/1 guard multiplier: 1 iff the pixel is a live image pixel.
        # Applied ONCE per matmul epilogue — replaces the flat layout's
        # per-tap border selects (8 of them), and keeps the scratch's
        # guard rows/cols exact zeros so the taps need no masking.
        wp, hp = spec.wp, spec.hp
        idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        col = jax.lax.rem(idx, wp)
        row = jax.lax.rem(jax.lax.div(idx, wp), hp)
        guard_mask = (
            (col >= 1) & (col <= w) & (row >= 1) & (row <= h)
        ).astype(jnp.float32)

    if spec.has_expand:
        if spec.ax1:
            # A8W8: int8 x int8 -> int32 on the MXU int8 path; the
            # activation scale is pre-folded into s1 by build_invres.
            e = jnp.dot(
                q8(x, spec.ax1), w1_ref[...],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            e = jnp.dot(
                x,
                w1_ref[...].astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )
        e = e * s1_ref[...] + o1_ref[...]
        e = apply_activation(e, spec.act_expand, spec.alpha)
        if guard_mask is not None:
            e = e * guard_mask  # zero the guards (act(offset) otherwise)
        epad_ref[g : g + p, :] = e.astype(compute_dtype)
    else:
        epad_ref[g : g + p, :] = x

    def _dw_project_store(base: int, ck: int):
        """Padded-layout dw taps + project + epilogue for pitch rows
        [base, base+ck), stored straight to out_ref — chunk-local
        temporaries instead of whole-plane (P, E) f32 streams."""
        acc = None
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * spec.wp + (dx - 1)
                sl = epad_ref[g + base + off : g + base + off + ck, :]
                term = (
                    sl.astype(jnp.float32)
                    * wd_ref[3 * dy + dx : 3 * dy + dx + 1, :]
                )
                acc = term if acc is None else acc + term
        d = acc * sd_ref[...] + od_ref[...]
        d = apply_activation(d, spec.act_dw, spec.alpha).astype(compute_dtype)
        if spec.ax2:
            y = jnp.dot(
                q8(d, spec.ax2), w2_ref[...],
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            y = jnp.dot(
                d,
                w2_ref[...].astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )
        y = y * s2_ref[...] + o2_ref[...]
        if spec.residual:
            y = y + x[base : base + ck].astype(jnp.float32)
        y = apply_activation(y, spec.act_out, spec.alpha)
        out_ref[base : base + ck, :] = y.astype(compute_dtype)

    if spec.padded and spec.row_chunk:
        ck = spec.row_chunk * spec.wp
        assert p % ck == 0, (p, ck)
        for t in range(p // ck):
            _dw_project_store(t * ck, ck)
        return

    if spec.padded:
        # Depthwise 3x3 SAME over the guard-padded pitch: tap (dy, dx)
        # is the slice shifted by (dy-1)*wp + (dx-1) — row shifts are
        # sublane-aligned (wp % 8 == 0), column shifts are +-1 sublane
        # rotates, and NO masks are needed (guards are exact zeros; a
        # column guard read wraps into the adjacent row's zero guard).
        acc = None
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * spec.wp + (dx - 1)
                sl = epad_ref[g + off : g + off + p, :]
                term = (
                    sl.astype(jnp.float32)
                    * wd_ref[3 * dy + dx : 3 * dy + dx + 1, :]
                )
                acc = term if acc is None else acc + term
    else:
        # Per-pixel in-image predicates shared by the 8 shifted taps. 2D
        # iota (TPU requires >=2D); integer div/mod lower to VPU ops.
        idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        col = jax.lax.rem(idx, w)
        row = jax.lax.rem(jax.lax.div(idx, w), h)
        not_col0 = col != 0  # tap reaches col-1: invalid in image col 0
        not_colw = col != w - 1  # tap reaches col+1
        not_row0 = row != 0
        not_rowh = row != h - 1

        # Depthwise 3x3 SAME, stride 1: acc[p] = sum_taps e[p+off]*wd[tap],
        # masked where the tap crosses an image border (guard rows make the
        # slices in-bounds; masks make them correct across batch
        # boundaries). The chain accumulates in f32: a bf16-accumulation
        # variant (halving the streamed temporaries) measured 1.45x SLOWER
        # on-chip — Mosaic's packed-bf16 elementwise + where-masks cost
        # more than the saved bandwidth (DEVNOTES r4).
        acc = None
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * w + (dx - 1)
                sl = epad_ref[g + off : g + off + p, :]
                m = None
                if dy == 0:
                    m = not_row0
                elif dy == 2:
                    m = not_rowh
                if dx == 0:
                    m = not_col0 if m is None else jnp.logical_and(m, not_col0)
                elif dx == 2:
                    m = not_colw if m is None else jnp.logical_and(m, not_colw)
                term = (
                    sl.astype(jnp.float32)
                    * wd_ref[3 * dy + dx : 3 * dy + dx + 1, :]
                )
                if m is not None:
                    term = jnp.where(m, term, 0.0)
                acc = term if acc is None else acc + term

    d = acc * sd_ref[...] + od_ref[...]
    d = apply_activation(d, spec.act_dw, spec.alpha).astype(compute_dtype)

    if spec.ax2:
        y = jnp.dot(
            q8(d, spec.ax2), w2_ref[...],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        y = jnp.dot(
            d,
            w2_ref[...].astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )
    y = y * s2_ref[...] + o2_ref[...]
    if spec.residual:
        y = y + x.astype(jnp.float32)
    y = apply_activation(y, spec.act_out, spec.alpha)
    out_ref[...] = y.astype(compute_dtype)


def fused_invres_block(
    x_nhwc,
    w1: Optional[jax.Array],
    s1: Optional[jax.Array],
    o1: Optional[jax.Array],
    wd: jax.Array,  # (9, E) f32/bf16 depthwise taps (HW-major)
    sd: jax.Array,
    od: jax.Array,
    w2: jax.Array,  # (E, Cout), f32/bf16/int8
    s2: jax.Array,
    o2: jax.Array,
    spec: InvResSpec,
    interpret: bool = False,
):
    """Run one fused inverted-residual block. x is NHWC (N, H, W, Cin);
    returns NHWC (N, H, W, Cout)."""
    n, h, w, cin = x_nhwc.shape
    assert (h, w, cin) == (spec.h, spec.w, spec.cin), (x_nhwc.shape, spec)
    compute_dtype = x_nhwc.dtype
    # b_tile depends on the runtime batch (jit retraces per shape), so it
    # is chosen here, not at plan time.
    b = plan_b_tile(spec, n, jnp.dtype(compute_dtype).itemsize)
    if b == 0:
        return None
    spec = dataclasses.replace(spec, b_tile=b)
    if spec.padded and spec.row_chunk:
        # largest chunk <= requested that divides the tile's pitch rows
        rows = b * spec.hp
        rc = min(spec.row_chunk, rows)
        while rows % rc:
            rc -= 1
        spec = dataclasses.replace(spec, row_chunk=rc)
    p = spec.p_tile()

    if spec.padded:
        # Guard-padded pitch (spec.padded docstring): one zero row above/
        # below, one zero column left, wp-w-1 right. XLA fuses the pad
        # into a single formatting copy; consecutive same-resolution
        # fused blocks could pass this layout through untouched.
        xp = jnp.pad(
            x_nhwc, ((0, 0), (1, 1), (1, spec.wp - w - 1), (0, 0))
        )
        x2d = xp.reshape(n * spec.hp * spec.wp, cin)
    else:
        x2d = x_nhwc.reshape(n * h * w, cin)

    def vec(v, width):
        return jnp.asarray(v, jnp.float32).reshape(1, width)

    operands = [x2d]
    in_specs = [pl.BlockSpec((p, cin), lambda i: (i, 0))]
    if spec.has_expand:
        operands += [w1, vec(s1, spec.e), vec(o1, spec.e)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    else:
        # Placeholders keep the kernel signature static.
        operands += [
            jnp.zeros((1, 1), compute_dtype),
            jnp.zeros((1, 1), jnp.float32),
            jnp.zeros((1, 1), jnp.float32),
        ]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    operands += [
        jnp.asarray(wd, jnp.float32).reshape(9, spec.e),
        vec(sd, spec.e),
        vec(od, spec.e),
        w2,
        vec(s2, spec.cout),
        vec(o2, spec.cout),
    ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6

    kernel = functools.partial(
        _invres_kernel, spec=spec, compute_dtype=compute_dtype
    )
    flops = 2 * n * h * w * (spec.cin * spec.e + 9 * spec.e + spec.e * spec.cout)
    rows_total = x2d.shape[0]
    margin = 2 * ((spec.wp + 1) if spec.padded else (w + 1))
    out = pl.pallas_call(
        kernel,
        grid=(n // b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((p, spec.cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_total, spec.cout), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((p + margin, spec.e), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(rows_total * (cin + spec.cout) + spec.e * (cin + spec.cout))
            * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)
    if spec.padded:
        out = out.reshape(n, spec.hp, spec.wp, spec.cout)
        return out[:, 1 : 1 + h, 1 : 1 + w, :]
    return out.reshape(n, h, w, spec.cout)


# Measured achievable rates on the target chip (micro-kernels, DEVNOTES
# r4): a dependent f32 FMA chain on (512,1024) VMEM blocks sustains
# ~35 TFLOP/s; the MXU peaks are the PEAK_FLOPS table values. Used by
# invres_floor_us to print a BINDING bound for the fused block kernels.
VPU_F32_FLOPS = 35e12
# The dw stage's true binding resource (r5 ablation, DEVNOTES): each of
# the 9 taps streams the whole (P, E) expanded plane out of VMEM, so the
# stage is VMEM-LOAD-bandwidth bound, not FMA bound. Measured on the
# 28x28/E192 ablation (full 16.0 us vs no-dw 7.25 us for 26.5 MB of tap
# loads + the f32 accumulator streams): ~4.3 TB/s sustained. The
# constant is derived from that one shape and cross-checked against the
# 14x14 and 7x7 blocks (non-circular for those).
VMEM_STREAM_GBS = 4300.0


def invres_floor_us(spec: InvResSpec, n: int, itemsize: int,
                    peak_mxu: float = 197e12,
                    peak_hbm: float = 819e9) -> dict:
    """Per-model-step floor (microseconds) for one fused block, from the
    kernel's issued work (the analog of chain_packed_pallas.
    mxu_slot_flops):

      - mxu: both 1x1 matmuls at their PADDED dims — contraction and lane
        dims round up to 128 (Mosaic tiles), M to the sublane granule;
        padding slots are issued and cost real cycles. int8 stages
        (ax1/ax2) run at 2x rate.
      - vpu: the depthwise stage = 9 taps x (mul + add + border-select)
        on (P, Ep) f32 blocks, at the measured achievable FMA rate.
      - hbm: the block's HBM traffic (x in, y out, weights once),
        overlapped with compute by the grid pipeline.

    floor = max(mxu + vpu [serial: the dw depends on the expand, the
    project on the dw], hbm). Dispatch overhead is measured separately
    by the bench (it is a property of the runtime, not the kernel).
    """
    b = plan_b_tile(spec, n, itemsize) or 1  # the tile the kernel RUNS at
    steps = max(n // b, 1)
    spec = dataclasses.replace(spec, b_tile=b)
    p = spec.p_tile()  # padded layout inflates M on both matmuls
    pp = _round_up(p, 8)
    kp1 = _round_up(spec.cin, 128)
    ep = _round_up(spec.e, 128)
    coutp = _round_up(spec.cout, 128)
    mxu_flops = 0.0
    if spec.has_expand:
        mxu_flops += 2 * pp * kp1 * ep / (2.0 if spec.ax1 else 1.0)
    mxu_flops += 2 * pp * ep * coutp / (2.0 if spec.ax2 else 1.0)
    if spec.padded:
        # 9 taps x (mul + add) + 2 guard-mask multiplies, no border selects
        vpu_ops = (9 * 2 + 2) * pp * ep
    else:
        # 9 taps x (mul + add) + 8 border-selects ~ 26 ops/pixel-channel
        vpu_ops = (9 * 2 + 8) * pp * ep
    # dw tap VMEM streams: 9 loads of the (P, E) plane (itemsize) + the
    # f32 accumulator write + read — the stage's measured binding
    # resource (VMEM_STREAM_GBS note above)
    vmem_bytes = (9 * itemsize + 2 * 4) * pp * ep
    act_bytes = (p * spec.cin + p * spec.cout) * itemsize
    w_bytes = (
        spec.cin * spec.e + 9 * spec.e + spec.e * spec.cout
    ) * itemsize  # loaded once (constant-index weight blocks)
    mxu_us = steps * mxu_flops / peak_mxu * 1e6
    # the dw stage's floor is whichever of its two resources binds:
    # FMA issue or the VMEM tap/accumulator streams
    vpu_us = steps * max(
        vpu_ops / VPU_F32_FLOPS, vmem_bytes / (VMEM_STREAM_GBS * 1e9)
    ) * 1e6
    hbm_us = (steps * act_bytes + w_bytes) / peak_hbm * 1e6
    return {
        "mxu_us": mxu_us,
        "vpu_us": vpu_us,
        "hbm_us": hbm_us,
        "floor_us": max(mxu_us + vpu_us, hbm_us),
    }


# ---------------------------------------------------------------------------
# Graph-level construction


def build_invres(views, in_spec, act_dtype, batch: int,
                 vmem_budget: int = 48 << 20, in_act_scale: float = 0.0,
                 a8w8: bool = True):
    """Build (operands, InvResSpec) for a matched [expand?, dw, project,
    add?] node run, or None if the geometry doesn't fit.

    `views` supply .params/.attr like compile.py's _NodeView so weights may
    be tracers (params pytree) under jit. in_act_scale: the calibrated
    act_scale of the block's input node (0 = no A8W8 on the expand matmul).
    a8w8=False (engine precision != INT8) keeps calibrated act_scale attrs
    inert so an FP32/BF16 rebuild never runs int8 activation compute.
    """
    from shadernn_tpu.ops.conv import epilogue_scale_offset

    expand, dw, project, add = views
    h, w, cin = in_spec.h, in_spec.w, in_spec.c

    def wq(v):
        return v.params["weight_q"] if "weight_q" in v.params else v.params["weight"]

    ax1 = ax2 = 0.0
    if expand is not None:
        w1_raw = wq(expand)  # (1, 1, Cin, E)
        e_ch = int(w1_raw.shape[-1])
        w1 = w1_raw.reshape(cin, e_ch)
        s1, o1 = epilogue_scale_offset(expand)
        if w1.dtype == jnp.int8 and in_act_scale > 0:
            ax1 = float(in_act_scale)
            s1 = jnp.asarray(s1) * ax1  # int32 acc carries 1/ax1
        elif w1.dtype != jnp.int8:
            w1 = w1.astype(act_dtype)
        act_expand = expand.attr("activation", "linear")
    else:
        w1 = s1 = o1 = None
        e_ch = cin
        act_expand = "linear"

    wd_raw = wq(dw)  # (3, 3, 1, E)
    if wd_raw.shape[:2] != (3, 3) or int(wd_raw.shape[-1]) != e_ch:
        return None
    wd = wd_raw.reshape(9, e_ch)
    sd, od = epilogue_scale_offset(dw)

    w2_raw = wq(project)  # (1, 1, E, Cout)
    cout = int(w2_raw.shape[-1])
    w2 = w2_raw.reshape(e_ch, cout)
    s2, o2 = epilogue_scale_offset(project)
    dw_scale = float(dw.attr("act_scale", 0.0) or 0.0) if a8w8 else 0.0
    if w2.dtype == jnp.int8 and dw_scale > 0:
        ax2 = dw_scale
        s2 = jnp.asarray(s2) * ax2
    elif w2.dtype != jnp.int8:
        w2 = w2.astype(act_dtype)

    spec = InvResSpec(
        h=h, w=w, cin=cin, e=e_ch, cout=cout,
        has_expand=expand is not None,
        residual=add is not None,
        act_expand=act_expand,
        act_dw=dw.attr("activation", "linear"),
        act_out=(add.attr("activation", "linear") if add is not None
                 else project.attr("activation", "linear")),
        alpha=float(dw.attr("leaky_alpha", 0.3)),
        ax1=ax1, ax2=ax2,
        # Padded-pitch where the dw stage dominates the kernel (28x28 and
        # 14x14 blocks, E <= 576); the 7x7/E>=960 blocks are MXU-bound AT
        # their floor, where the layout's M inflation would only add
        # slots. Measured r5 (model trace, int8 b8): flat 137.8 us ->
        # padded whole-plane 111.3 us across the 11 fused kernels; the
        # row_chunk variants (the r4-parked register-resident lever) were
        # NEUTRAL on top of the padded layout (rc=8: 115.5, rc=16:
        # 112.8) — once the border selects and unaligned shifts are
        # gone, Mosaic's own scheduling already keeps the dw local, so
        # whole-plane stays the default (DEVNOTES r5).
        padded=(e_ch <= 576),
    )

    if plan_b_tile(spec, batch, jnp.dtype(act_dtype).itemsize, vmem_budget) == 0:
        return None

    if spec.has_expand:
        operands = (w1, s1, o1, wd, sd, od, w2, s2, o2)
    else:
        operands = (None, None, None, wd, sd, od, w2, s2, o2)
    return operands, spec


def match_invres_block(graph, dw_node, options) -> Optional[tuple]:
    """Match [expand?] -> dw(3x3, s1) -> project(1x1) [-> add] around a
    SeparableConv2D node. Returns (expand, dw, project, add) Node tuple
    (expand/add may be None) or None.

    Only exact MobileNet-shaped chains fuse: single-consumer links, SAME
    padding, stride 1, multiplier 1; the residual must add the head's own
    input (the inverted-residual skip).
    """
    from shadernn_tpu.ops.conv import _conv_pads

    if dw_node.op != "SeparableConv2D":
        return None
    if int(dw_node.attr("kernel_size")) != 3 or int(dw_node.attr("stride", 1)) != 1:
        return None
    if int(dw_node.attr("multiplier", 1)) != 1:
        return None
    if _conv_pads(dw_node) != (1, 1, 1, 1):
        return None
    if len(dw_node.inputs) != 1 or dw_node.name in graph.output_names:
        return None

    def sole_consumer(n):
        if n.name in graph.output_names:
            return None
        cons = graph.consumers(n.name)
        return cons[0] if len(cons) == 1 else None

    def is_1x1(n):
        return (
            n is not None
            and n.op == "Conv2D"
            and len(n.inputs) == 1
            and int(n.attr("kernel_size")) == 1
            and int(n.attr("stride", 1)) == 1
        )

    project = sole_consumer(dw_node)
    if not is_1x1(project):
        return None

    expand = graph.nodes[dw_node.inputs[0]]
    if not (is_1x1(expand) and sole_consumer(expand) is dw_node):
        expand = None

    head = expand if expand is not None else dw_node
    skip_name = head.inputs[0]

    add = sole_consumer(project)
    if (
        add is not None
        and add.op == "Add"
        and len(add.inputs) == 2
        and set(add.inputs) == {skip_name, project.name}
        and graph.nodes[skip_name].out_spec.shape == project.out_spec.shape
    ):
        pass
    else:
        add = None

    e_ch = dw_node.out_spec.c
    if e_ch > 1024:
        return None
    # Measured AUTO gate (v5e, MobileNetV2 bf16 b8): the fused kernel wins
    # at <=28x28 (XLA's per-layer small matmuls + fusion overhead dominate
    # there: 3 layers ~60us -> one 25us kernel), but LOSES at large spatial
    # with narrow E (112x112/E32: 537us fused vs ~150us XLA; 56x56/E144:
    # 132us vs ~25us) because E < 128 lanes leaves the VPU mostly idle in
    # the 9-tap depthwise loop. See DEVNOTES.md.
    hw = dw_node.out_spec.h * dw_node.out_spec.w
    if hw > 784:
        return None
    return (expand, dw_node, project, add)
