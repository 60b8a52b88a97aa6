"""Column-packed fused conv-chain kernel — the format redesign that moves
the chain from VPU-store-bound to MXU-bound.

Why: the im2col chain kernel (chain_pallas.py) assembles, per MXU dot, kw
lane-shifted copies of the input slab into a patch scratch. DEVNOTES'
bound analysis measured that patch assembly as the binding resource
(~1.7G VPU element-stores per ESPCN b8 step -> 1.47 ms at the VPU store
ceiling, only 9.4% of MXU peak). This kernel eliminates the per-dot
stores entirely with a *column-packed* activation format:

    (row, qx*c, G)   with  G = W/8 lane groups in lanes,
                           qx in [0, 8+kw-1) packed-column slots and
                           c channels in sublanes (qx-major).

Lane group g, slot qx holds image column  8*(g-1) + qx - pl  (one left
zero-margin group; pl = the consumer conv's left pad). A conv window for
any output column of group g then lives entirely inside sublanes of lane
g: the MXU dot

    Wmat[(dy, qx, c), (rr, px, o)]  x  slab[(dy, qx, c), g]

computes ALL 8 columns px of every group at once (M = r*8*o, full 128
for o=16), reading the previous layer's scratch directly — no im2col.
The (px, dx) -> qx = px+dx geometry is absorbed into the *weight matrix*
(zero-padded where qx-px is outside [0, kw)): zero entries cost MXU
slots, not VPU stores. This is DEVNOTES' "channel-packing multiple W
columns per lane group": one stored element feeds every (px, dx) tap
with px + dx = qx.

Per output row the epilogue writes the dot result once into the next
layer's scratch: an aligned store at sublane offset pl*c (the in-group
bulk) plus kw-1 single-lane-shifted margin rows (the columns a window
borrows from groups g+-1). VPU stores per step drop ~8x; the kernel
becomes MXU-slot-bound with a printable bound:

    t_floor = sum_l rows_l * (r*8*o)_l * K_l * G * 2 / MXU_peak_flops

where K_l = (kh+r-1) * qxp * c — the *padded* contraction including the
weight-matrix zeros (useful fraction kh*kw/( (kh+r-1)*qxp ) ~ 30% for
3x3; the padding is the price of zero patch assembly and is counted in
the printed bound, see bench.py).

The model input is pre-packed by XLA (strided slices build the qx
overlap; one fused pad+transpose, bandwidth-bound on the small input),
so the kernel DMAs packed rows straight from HBM.

Reference analog: ShaderNN's MNN-style tiled compute-shader conv packs
IC4/OC4 texel blocks for the same reason — feed the MAC units without
per-tap gather (shadertemplate_cs_conv2d.glsl:24-80, conv2dGL.cpp:1036).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shadernn_tpu.kernels.conv_pallas import (
    MB, MH, _mxu_precision, _round_up,
)
from shadernn_tpu.ops.common import apply_activation

P = 8  # image columns per lane group
GL = 1  # left zero-margin groups
TH = 64  # default output rows per grid step (see fused_conv_chain_packed)


@dataclasses.dataclass(frozen=True)
class PackedLayerSpec:
    kh: int
    kw: int
    c: int  # true input channels
    o: int  # true output channels (no tile padding needed in this format)
    pt: int
    pb: int
    pl: int
    pr: int
    activation: str
    alpha: float
    r: int  # output rows per dot (M = r*8*o)
    qxp: int  # padded qx slots of this layer's INPUT scratch
    # A8 mode (VERDICT r4 #3): dequant scale of this layer's int8 INPUT
    # (x ~ x_q * in_q). 0.0 = the input slab stays in the compute dtype.
    # When in_q > 0 the layer's dot runs int8 x int8 -> int32 on the MXU's
    # double-rate path, and the PREVIOUS layer's epilogue quantizes into
    # this layer's scratch (store multiplier 1/in_q, symmetric +/-127).
    in_q: float = 0.0


def _in_dtype(spec: PackedLayerSpec, compute_dtype):
    return jnp.int8 if spec.in_q > 0.0 else compute_dtype


def _plan_rows(specs: Sequence[PackedLayerSpec], th: int):
    n = len(specs)
    a = [0] * (n + 1)
    b = [0] * (n + 1)
    for l in range(n - 1, -1, -1):
        a[l] = a[l + 1] + specs[l].pt
        b[l] = b[l + 1] + (specs[l].kh - 1 - specs[l].pt)
    rows = [th + a[l] + b[l] for l in range(n + 1)]
    return a, rows


def _qx_pad(kw: int, c: int, dtype) -> int:
    """Smallest qxp >= 8+kw-1 with qxp*c a multiple of the sublane tile."""
    dt = jnp.dtype(dtype)
    tile = 32 if dt == jnp.int8 else (16 if dt == jnp.bfloat16 else 8)
    q = P + kw - 1
    while (q * c) % tile:
        q += 1
    return q


def _packed_kernel(
    x_hbm,  # (N/ib, Hp_in, qxp0*c0, Gp) packed input
    *refs,
    specs: Tuple[PackedLayerSpec, ...],
    th: int,
    gp: int,   # TOTAL lane groups = ib * gpi
    gpi: int,  # lane groups per image
    h_list: Tuple[int, ...],
    w_list: Tuple[int, ...],
    a_offsets: Tuple[int, ...],
    rows_list: Tuple[int, ...],
    n_h_tiles: int,
    hp_in: int,
    compute_dtype,
    tail: str,
):
    nlayers = len(specs)
    w_refs = refs[0:nlayers]
    scale_refs = refs[nlayers : 2 * nlayers]
    offset_refs = refs[2 * nlayers : 3 * nlayers]
    out_ref = refs[3 * nlayers]
    xs = refs[3 * nlayers + 1]  # (2, rows0, 8*c0, Gp) phase layout
    s0 = refs[3 * nlayers + 2]  # (rows0, qxp0*c0, Gp) layer-0 qx slab
    layer_scratch = refs[3 * nlayers + 3 : 3 * nlayers + 2 + nlayers]
    sem = refs[-1]

    i = pl.program_id(1)
    rows0 = rows_list[0]

    def dma(slot, tile_idx):
        n = pl.program_id(0)
        # The packed input carries exactly a_offsets[0] zero rows on top
        # (pack_input tp), so every tile's window starts at tile*th with
        # no clip-shift hazard; hp_in covers the last tile's overhang.
        start = jnp.clip(tile_idx * th, 0, hp_in - rows0)
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(start, rows0)], xs.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma(slot, i).start()
        # Zero the padding qx slots once: the weight rows there are zero,
        # but 0 * uninitialized-VMEM could still be NaN.
        s0spec = specs[0]
        used0 = (P + s0spec.kw - 1) * s0spec.c
        if used0 < s0spec.qxp * s0spec.c:
            s0[:, used0:, :] = jnp.zeros(
                (rows0, s0spec.qxp * s0spec.c - used0, gp),
                _in_dtype(s0spec, compute_dtype),
            )
        for l in range(nlayers - 1):
            ns = specs[l + 1]
            used = (P + ns.kw - 1) * ns.c
            if used < ns.qxp * ns.c:
                layer_scratch[l][:, used:, :] = jnp.zeros(
                    (rows_list[l + 1], ns.qxp * ns.c - used, gp),
                    _in_dtype(ns, compute_dtype),
                )

    @pl.when(i + 1 < n_h_tiles)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    # Assemble layer 0's qx slab from the phase rows: qx = pl0 + b for the
    # aligned bulk, plus pl0 left / kw-1-pl0 right single-lane-shift rows
    # (xq[qx][g] = phase[qx-pl0+8][g-1] / phase[qx-pl0-8][g+1]).
    # Whole-slab 3D stores (all rows at once): the per-row store loop this
    # replaces issued 5 small stores x rows0 per grid step.
    sp0 = specs[0]
    c0, pl0 = sp0.c, sp0.pl
    ph_all = xs[slot]  # (rows0, 8*c0, Gp)
    s0[:, pl0 * c0 : (pl0 + P) * c0] = ph_all
    z0r = jnp.zeros((rows0, c0, 1), _in_dtype(sp0, compute_dtype))
    for qx in range(pl0):
        b = qx - pl0 + P
        s0[:, qx * c0 : (qx + 1) * c0, 1:] = ph_all[
            :, b * c0 : (b + 1) * c0, : gp - 1
        ]
        s0[:, qx * c0 : (qx + 1) * c0, 0:1] = z0r
    for t2 in range(sp0.kw - 1 - pl0):
        qx = pl0 + P + t2
        s0[:, qx * c0 : (qx + 1) * c0, : gp - 1] = ph_all[
            :, t2 * c0 : (t2 + 1) * c0, 1:
        ]
        s0[:, qx * c0 : (qx + 1) * c0, gp - 1 : gp] = z0r

    gid = jax.lax.broadcasted_iota(jnp.int32, (1, gp), 1)

    for l, spec in enumerate(specs):
        int8_dot = spec.in_q > 0.0
        wmat = w_refs[l][...]
        if int8_dot:
            assert wmat.dtype == jnp.int8  # build_chain_packed guarantees
        elif wmat.dtype != compute_dtype:
            wmat = wmat.astype(compute_dtype)
        scale = scale_refs[l][...]  # (M, 1) f32, o-minor (rr, px, o) order
        offset = offset_refs[l][...]
        kdim = wmat.shape[0]
        last = l == nlayers - 1
        out_rows = rows_list[l + 1]
        r, o = spec.r, spec.o
        m = r * P * o
        rows_patch = spec.kh + r - 1
        # M-order ids for masking: rr (sub-row) and px (column-in-group).
        # Last d2s2 layer uses M order (rr, py, px, px2) — chosen so the
        # whole dot result stores contiguously (see the d2s2 tail below);
        # other layers use (rr, px, o).
        mi = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        if last and tail == "d2s2":
            # M order (px2, rr, py, px): px2 halves are contiguous slices
            # (Mosaic cannot lower stride-2 sublane selects), and each
            # half's (rr, py, px) order matches the destination sublanes.
            rid = (mi - (mi // (2 * r * P)) * (2 * r * P)) // (2 * P)
            pxv = mi - (mi // P) * P  # mi % P
        else:
            rid = mi // (P * o)
            pxv = (mi // o) - (mi // (P * o)) * P  # (mi // o) % P
        # image column of (px, g) — per image when ib images share lanes
        gimg = gid - (gid // gpi) * gpi
        col = P * gimg + pxv - P * GL
        colok = (col >= 0) & (col < w_list[l])
        n_dots = -(-out_rows // r)
        for t in range(n_dots):
            j0 = min(t * r, out_rows - r)  # tail tile recomputes rows
            if l == 0:
                slab = s0[j0 : j0 + rows_patch]
            else:
                slab = layer_scratch[l - 1][j0 : j0 + rows_patch]
            patch = slab.reshape(kdim, gp)
            if int8_dot:
                # int8 x int8 -> int32 at the MXU's double rate; the
                # input dequant scale in_q is folded into `scale` by
                # build_chain_packed, so the f32 epilogue is unchanged.
                acc = jax.lax.dot_general(
                    wmat,
                    patch,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                acc = jax.lax.dot_general(
                    wmat,
                    patch,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mxu_precision(compute_dtype),
                )  # (M, Gp) f32
            y = acc * scale + offset
            y = apply_activation(y, spec.activation, spec.alpha)
            # margins must be EXACT zeros (they are the next conv's padding).
            # Valid image rows of layer l+1 sit at buffer rows [0, h_l):
            # the top zero-pad is exactly a_offsets[0] input rows, which the
            # per-layer offsets consume, so no fixed-margin shift remains.
            # (A variant folding the row mask into (M,1) scale/offset and
            # skipping last-layer masks measured 1.64x SLOWER on-chip —
            # Mosaic pessimizes the per-dot (M,1) arithmetic; the single
            # fused (M,Gp) mask multiply is the fast form.)
            g0 = i * th - a_offsets[l + 1] + j0
            rowok = (g0 + rid >= 0) & (g0 + rid < h_list[l])
            y = y * (rowok & colok).astype(jnp.float32)
            ib = gp // gpi
            if last and tail == "c1":
                # (N, hp*8, Gpi): row j, column-slot px at sublane j*8+px.
                # Dot rows rr are destination-contiguous: one store per dot
                # per packed image (the out block is per-image so the XLA
                # unpack needs no batch un-interleave pass).
                yc = y.astype(out_ref.dtype)
                for t2 in range(ib):
                    out_ref[t2, j0 * P : (j0 + r) * P] = yc[
                        :, t2 * gpi : (t2 + 1) * gpi
                    ]
            elif last and tail == "d2s2":
                # depth_to_space(2) for o=4 heads: channel py*2+px2 lands at
                # out (2j+py, 2w+px2), w = 8(g-1)+px. The weight matrix was
                # built with M order (px2, rr, py, px): the px2=0/1 halves
                # are contiguous M slices whose (rr, py, px) order matches
                # the destination sublanes, so the pair-packed u32 block
                # stores in ONE (2rP, Gp) store per dot instead of 2*P*r
                # single-sublane stores (measured as the kernel's dominant
                # non-dot overhead). XLA unpacks the u32 pairs outside
                # (bandwidth-bound).
                ye = y[: m // 2]  # px2 = 0 (the even output columns)
                yo = y[m // 2 :]  # px2 = 1

                def pack(u, v):
                    u16 = jax.lax.bitcast_convert_type(
                        u.astype(jnp.bfloat16), jnp.uint16)
                    v16 = jax.lax.bitcast_convert_type(
                        v.astype(jnp.bfloat16), jnp.uint16)
                    return u16.astype(jnp.uint32) | (v16.astype(jnp.uint32) << 16)

                u32 = pack(ye, yo)
                for t2 in range(ib):
                    out_ref[t2, 2 * j0 * P : 2 * (j0 + r) * P] = u32[
                        :, t2 * gpi : (t2 + 1) * gpi
                    ]
            elif last:  # tail == "none": packed rows, unpacked by XLA
                yc = y.astype(out_ref.dtype)
                for t2 in range(ib):
                    out_ref[t2, j0 * P * o : (j0 + r) * P * o] = yc[
                        :, t2 * gpi : (t2 + 1) * gpi
                    ]
            else:
                nspec = specs[l + 1]
                npl, nkw, nc = nspec.pl, nspec.kw, nspec.c  # nc == o
                if nspec.in_q > 0.0:
                    # quantize into the next layer's int8 slab (symmetric,
                    # zero-point 0: margin zeros stay exact padding)
                    yc = jnp.clip(
                        jnp.round(y * (1.0 / nspec.in_q)), -127.0, 127.0
                    ).astype(jnp.int8)
                else:
                    yc = y.astype(compute_dtype)
                zcol = jnp.zeros((nc, 1), _in_dtype(nspec, compute_dtype))
                for rr in range(r):
                    blk = yc[rr * P * o : (rr + 1) * P * o]  # (8*o, Gp)
                    row = j0 + rr
                    # bulk: in-group columns land at qx = px + npl
                    layer_scratch[l][row, npl * nc : (npl + P) * nc] = blk
                    # left margins qx < npl come from group g-1, px=8-npl+qx
                    for qx in range(npl):
                        src = blk[(P - npl + qx) * nc : (P - npl + qx + 1) * nc]
                        layer_scratch[l][row, qx * nc : (qx + 1) * nc, 1:] = (
                            src[:, : gp - 1]
                        )
                        layer_scratch[l][row, qx * nc : (qx + 1) * nc, 0:1] = zcol
                    # right margins qx >= npl+8 come from group g+1, px=qx-npl-8
                    for t2 in range(nkw - 1 - npl):
                        qx = npl + P + t2
                        src = blk[t2 * nc : (t2 + 1) * nc]
                        layer_scratch[l][
                            row, qx * nc : (qx + 1) * nc, : gp - 1
                        ] = src[:, 1:]
                        layer_scratch[l][
                            row, qx * nc : (qx + 1) * nc, gp - 1 : gp
                        ] = zcol


def pack_input(x, compute_dtype, tp: int = MH, mb: int = MB, ib: int = 1,
               quant_scale: float = 0.0):
    """XLA pre-pack: NHWC (N,H,W,C) -> phase layout
    (N/ib, tp+H+mb, 8*C, ib*Gp) where sublane (b, c) of lane t*Gp+g holds
    image (block*ib + t)'s column 8*(g-1)+b. ONE reshape+transpose (a
    single data-formatting copy, ~bandwidth); the qx overlap slab is
    assembled in-kernel from aligned copies + two single-lane shifts
    (strided slices here measured 197us EACH on XLA:TPU — 2.4 ms of a
    3.9 ms step). tp: top zero rows (= the chain's total top padding
    a_offsets[0] — every padded row is processed, so no fat fixed
    margin); mb: bottom rows covering the last DMA window overhang.
    ib: images packed side by side in lanes — the dots then run at
    N = ib*Gp, amortizing per-dot MXU sequencing overhead (cross-image
    lane-shift leakage is safe: every image's group 0 and dead tail
    groups are exact zeros). Returns (packed, Gp-per-image).
    quant_scale: when > 0, the pack quantizes the frame to int8 with this
    DEQUANT scale (x ~ x_q * quant_scale) inside the same pad+transpose
    pass — the a8 chain's zero-extra-pass input quantization."""
    n, h, w, c = x.shape
    gp = _round_up(GL + -(-w // P) + 1, 128)
    assert n % ib == 0
    if quant_scale > 0.0:
        xc = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / quant_scale)),
            -127.0, 127.0,
        ).astype(jnp.int8)
    else:
        xc = x.astype(compute_dtype)
    xw = jnp.pad(
        xc,
        ((0, 0), (tp, mb), (P * GL, P * gp - P * GL - w), (0, 0)),
    )  # (N, Hp, 8*Gp, C)
    hp = xw.shape[1]
    xq = xw.reshape(n // ib, ib, hp, gp, P, c)
    xq = jnp.transpose(xq, (0, 2, 4, 5, 1, 3))  # (Nb, Hp, 8, C, ib, Gp)
    return xq.reshape(n // ib, hp, P * c, ib * gp), gp


def fused_conv_chain_packed(
    x,  # NHWC (N, H, W, C)
    layer_params: List[dict],
    specs: List[PackedLayerSpec],
    *,
    interpret: bool = False,
    tail: str = "none",
    th: int = TH,
    compute_dtype=None,
):
    """Run the whole chain in packed-column format.

    tail: "none" -> NHWC (N,H,W,o); "c1" (o=1) -> NHWC (N,H,W,1);
    "d2s2" (o=4) -> NHWC (N,2H,2W,1) with the subpixel fused.
    th: output rows per grid step. Larger tiles amortize the kh-1-row
    vertical margin recompute over more useful rows (the margin rows are
    re-derived per tile; at th=32 that is ~25% of layer-0 rows, at th=64
    ~12.5%) at the cost of more VMEM scratch and a longer unrolled-loop
    compile. Must be a multiple of 8 (d2s2 sublane stores).
    compute_dtype: override the x.dtype-derived compute type — lets the
    caller hand in the RAW f32 model input (pack_input folds the bf16
    cast into its pad+transpose pass; a separate upfront cast measured
    35us/step at 540p b8).
    """
    nlayers = len(specs)
    n, h, wdim, cin = x.shape
    assert cin == specs[0].c
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    h_list, w_list = [], []
    h_out, w_out = h, wdim
    for s in specs:
        h_out = h_out + s.pt + s.pb - s.kh + 1
        w_out = w_out + s.pl + s.pr - s.kw + 1
        h_list.append(h_out)
        w_list.append(w_out)

    a_off, rows_list = _plan_rows(specs, th)
    o_last = specs[-1].o
    # Tight row budget: the top pad is exactly a_off[0] (consumed by the
    # per-layer offsets), output buffer rows [0, h_out) are the valid
    # image, and the bottom pad only covers the last tile's DMA overhang.
    # (The previous fixed MH/MB margins made every step process ~15% pure
    # zero-pad rows at 540p.)
    n_h_tiles = -(-h_out // th)
    hp_out = n_h_tiles * th
    tp = a_off[0]
    mb = (n_h_tiles - 1) * th + rows_list[0] - tp - h
    # Pack ib images side by side in lanes: the dots run at N = ib*Gp,
    # amortizing per-dot MXU sequencing (measured: the bare dot+store
    # floor sat 17% above the slot bound at N = 128). Capped by VMEM.
    # The estimate counts scratch slabs + output block + weight/scale
    # operands (ADVICE r4: scratch-only estimates could pass the gate and
    # then fail Mosaic VMEM allocation at compile time).
    gpi_probe = _round_up(GL + -(-wdim // P) + 1, 128)
    itemsz = [jnp.dtype(_in_dtype(s, compute_dtype)).itemsize for s in specs]
    scratch_per_img = sum(
        rows_list[l + 1] * specs[l + 1].qxp * specs[l + 1].c * itemsz[l + 1]
        for l in range(nlayers - 1)
    ) + 3 * rows_list[0] * max(P, specs[0].qxp) * cin * itemsz[0]
    out_sub = 2 * P if tail == "d2s2" else P * (1 if tail == "c1" else o_last)
    out_bytes_per_img = th * out_sub * (
        4 if tail == "d2s2" else jnp.dtype(compute_dtype).itemsize
    )
    fixed_bytes = sum(
        int(np.prod(p["wmat"].shape)) * jnp.dtype(p["wmat"].dtype).itemsize
        + 2 * s.r * P * s.o * 4  # (M,1) f32 scale + offset
        for p, s in zip(layer_params, specs)
    )
    ib = 1
    for cand in (4, 2):
        if n % cand == 0 and (
            (scratch_per_img + out_bytes_per_img) * gpi_probe * cand
            + fixed_bytes < 80 * 1024 * 1024
        ):
            ib = cand
            break
    xq, gpi = pack_input(x, compute_dtype, tp=tp, mb=max(mb, 0), ib=ib,
                         quant_scale=specs[0].in_q)
    gp = ib * gpi  # total lanes seen by the kernel
    nb = n // ib
    hp_in = xq.shape[1]

    assert tail in ("none", "c1", "d2s2")
    if tail == "c1":
        assert o_last == 1
    if tail == "d2s2":
        assert o_last == 4 and compute_dtype == jnp.bfloat16

    kernel = functools.partial(
        _packed_kernel,
        specs=tuple(specs), th=th, gp=gp, gpi=gpi,
        h_list=tuple(h_list), w_list=tuple(w_list),
        a_offsets=tuple(a_off), rows_list=tuple(rows_list),
        n_h_tiles=n_h_tiles, hp_in=hp_in,
        compute_dtype=compute_dtype, tail=tail,
    )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [xq]
    for p in layer_params:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(p["wmat"])
    for key in ("scale", "offset"):
        for p, s in zip(layer_params, specs):
            # per-o vector -> (M, 1) matching the layer's M order:
            # (rr, px, o) normally; (rr, py, px, px2) for the d2s2 layer
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            vec = jnp.asarray(p[key]).reshape(-1)
            if p.get("m_order") == "d2s2":
                idx = np.array(
                    [2 * py + px2
                     for px2 in (0, 1) for _rr in range(s.r)
                     for py in (0, 1) for _px in range(P)], np.int32)
                operands.append(
                    vec[idx].reshape(-1, 1).astype(jnp.float32))
            else:
                operands.append(
                    jnp.tile(vec, s.r * P).reshape(-1, 1).astype(jnp.float32))

    in_dt0 = _in_dtype(specs[0], compute_dtype)
    scratches = [
        pltpu.VMEM((2, rows_list[0], P * cin, gp), in_dt0),
        pltpu.VMEM((rows_list[0], specs[0].qxp * cin, gp), in_dt0),
    ]
    for l in range(nlayers - 1):
        ns = specs[l + 1]
        scratches.append(
            pltpu.VMEM(
                (rows_list[l + 1], ns.qxp * ns.c, gp),
                _in_dtype(ns, compute_dtype),
            )
        )
    scratches.append(pltpu.SemaphoreType.DMA((2,)))

    # Output is PER-IMAGE (block dim0 = ib): the kernel slices each dot's
    # lane chunks into image-separate blocks, so the XLA unpack needs no
    # batch un-interleave pass (a full extra memory pass when tried).
    if tail == "d2s2":
        # sublane s = (2j+py)*P + px (the (ib,2th,P,gpi) layout flattened
        # so each dot's rows store contiguously)
        out_specs = pl.BlockSpec(
            (ib, 2 * th * P, gpi), lambda ni, hi: (ni, hi, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((n, 2 * hp_out * P, gpi), jnp.uint32)
    else:
        rows_sub = P * (1 if tail == "c1" else o_last)
        out_specs = pl.BlockSpec(
            (ib, th * rows_sub, gpi), lambda ni, hi: (ni, hi, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (n, hp_out * rows_sub, gpi), compute_dtype
        )
    out = pl.pallas_call(
        kernel,
        grid=(nb, n_h_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)

    if tail == "d2s2":
        # Transpose the u32 array FIRST (4D, 32-bit elements), then
        # bitcast to bf16 pairs: out col 2*(8(g-1)+px)+e = 16g+2px+e-16.
        # Transposing the bitcast 5D bf16 view instead makes XLA shuffle
        # packed sublane pairs (slower relayout kernel).
        out = out.reshape(n, 2 * hp_out, P, gpi)
        tr = jnp.transpose(out[:, : 2 * h_out], (0, 1, 3, 2))  # (N,2H,G,8)
        half = jax.lax.bitcast_convert_type(tr, jnp.bfloat16)
        half = half.reshape(n, 2 * h_out, 2 * P * gpi)
        return half[:, :, 2 * P * GL : 2 * P * GL + 2 * w_out][..., None]
    if tail == "c1":
        y = out.reshape(n, hp_out, P, gpi)[:, :h_out]
        y = jnp.transpose(y, (0, 1, 3, 2)).reshape(n, h_out, gpi * P)
        return y[:, :, P * GL : P * GL + w_out][..., None]
    y = out.reshape(n, hp_out, P, o_last, gpi)[:, :h_out]
    y = jnp.transpose(y, (0, 1, 4, 2, 3)).reshape(n, h_out, gpi * P, o_last)
    return y[:, :, P * GL : P * GL + w_out]


# ---------------------------------------------------------------------------
# Graph-level construction


def mxu_slot_flops(specs: Sequence[PackedLayerSpec], h: int, w: int,
                   th: int = TH) -> float:
    """Padded MXU slots (in bf16-equivalent FLOPs) per image: the kernel's
    binding bound. Counts every K x M x N slot the dots issue, including
    weight-matrix zeros and halo/margin recompute rows — bench.py prints
    achieved vs this bound (see module docstring). Layers whose dot runs
    int8 x int8 (spec.in_q > 0) issue slots at DOUBLE the MXU rate, so
    their slots count at half weight against the bf16 peak the bench
    divides by. th must match the tile height the kernel ran with
    (fused_conv_chain_packed default)."""
    gp = _round_up(GL + -(-w // P) + 1, 128)
    total = 0.0
    a_off, rows_list = _plan_rows(specs, th)
    n_h_tiles = -(-h // th)  # h here = final out rows
    for l, s in enumerate(specs):
        out_rows = rows_list[l + 1]
        n_dots = -(-out_rows // s.r)
        k = (s.kh + s.r - 1) * s.qxp * s.c
        m = s.r * P * s.o
        rate = 0.5 if s.in_q > 0.0 else 1.0
        total += n_h_tiles * n_dots * 2 * k * m * gp * rate
    return total


def build_chain_packed(
    nodes, in_channels: int, act_dtype,
    act_override: Optional[Tuple[str, float]] = None,
    th: int = TH,
    width: Optional[int] = None,
    tail: str = "none",
    a8: bool = False,
) -> Optional[Tuple[list, list]]:
    """Build (layer_params, specs) for a stride-1 conv run in packed
    format, or None if unsupported (caller falls back to the im2col
    chain kernel).

    a8 (VERDICT r4 #3): best-effort int8 ACTIVATIONS per layer — a layer's
    dot runs int8 x int8 when (a) its weights are already int8
    (engine INT8 precision), (b) its input range is statically boundable
    (previous activation tanh/sigmoid/relu6, a calibrated in_act_scale
    attr, or the [0,1] model frame for the chain head), and (c) its input
    channel count keeps the int8 margin stores at physical-row granularity
    (c % 8 == 0). Unsupported layers silently stay on the bf16 dot, so a8
    never changes which chains compile — only how their hot dots issue.
    """
    from shadernn_tpu.ops.common import padding_offsets
    from shadernn_tpu.ops.conv import epilogue_scale_offset

    dt = jnp.dtype(act_dtype)
    if dt not in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)):
        return None
    specs: List[PackedLayerSpec] = []
    raw = []
    c = in_channels
    for idx, node in enumerate(nodes):
        if int(node.attr("stride", 1)) != 1:
            return None
        k = int(node.attr("kernel_size"))
        o = int(node.attr("out_channels"))
        if k > P + 1 or o > 32:  # margins span only g+-1; M <= 256
            return None
        if idx > 0 and dt == jnp.bfloat16 and c % 2:
            return None  # odd sublane offsets break bf16 pair packing
        pt, pb, pl_, pr = padding_offsets(node.attr("padding", "same"), k)
        scale, offset = epilogue_scale_offset(node)
        if "weight_q" in node.params:
            w = jnp.asarray(node.params["weight_q"])
        else:
            w = jnp.asarray(node.params["weight"], act_dtype)
        act = node.attr("activation", "linear")
        alpha = float(node.attr("leaky_alpha", 0.3))
        if act_override is not None and idx == len(nodes) - 1:
            act, alpha = act_override
        r = max(1, min(128 // (P * o), 8)) if P * o <= 128 else 1
        specs.append(PackedLayerSpec(
            kh=k, kw=k, c=c, o=o, pt=pt, pb=pb, pl=pl_, pr=pr,
            activation=str(act), alpha=alpha, r=r,
            qxp=_qx_pad(k, c, act_dtype),
        ))
        raw.append((w, scale, offset))
        c = o
    if a8:
        for l, s in enumerate(specs):
            if raw[l][0].dtype != jnp.int8 or s.c % 8:
                continue
            if l == 0:
                # the chain head eats the raw model frame: calibrated
                # scale if present, else the normalized-image [0,1] range
                # (the reference zoo's inputRange for these models)
                q = float(nodes[0].attr("in_act_scale", 0.0) or 0.0) \
                    or (1.0 / 127.0)
            else:
                prev_act = specs[l - 1].activation
                if prev_act in ("tanh", "sigmoid"):
                    q = 1.0 / 127.0  # codomain bound: |y| <= 1
                elif prev_act == "relu6":
                    q = 6.0 / 127.0
                else:
                    q = float(nodes[l].attr("in_act_scale", 0.0) or 0.0)
                if q <= 0.0:
                    continue
            w_l, scale_l, offset_l = raw[l]
            specs[l] = dataclasses.replace(
                specs[l], in_q=q, qxp=_qx_pad(s.kw, s.c, jnp.int8)
            )
            # fold the input dequant into the f32 epilogue scale
            raw[l] = (w_l, scale_l * q, offset_l)
    # geometry + VMEM gates. Top/bottom input pads are computed exactly
    # from the chain's own offsets (fused_conv_chain_packed), so the only
    # geometry cap is keeping the vertical halo small vs the tile.
    a_off, rows = _plan_rows(specs, th)
    b0 = rows[0] - th - a_off[0]
    if a_off[0] > th or b0 > th:
        return None
    # real VMEM footprint: per-layer scratch slabs + the double-buffered
    # phase input, all gp lanes wide (gp known once the caller passes the
    # image width; 1024 = the 8k-wide worst case otherwise)
    gp = (_round_up(GL + -(-width // P) + 1, 128) if width else 1024)
    sz0 = jnp.dtype(_in_dtype(specs[0], dt)).itemsize
    bytes_needed = 2 * rows[0] * P * specs[0].c * sz0
    bytes_needed += rows[0] * specs[0].qxp * specs[0].c * sz0
    for l in range(len(specs) - 1):
        ns = specs[l + 1]
        bytes_needed += (
            rows[l + 1] * ns.qxp * ns.c
            * jnp.dtype(_in_dtype(ns, dt)).itemsize
        )
    if bytes_needed * gp > 80 * 1024 * 1024:
        return None
    for l, s in enumerate(specs):
        r = min(s.r, rows[l + 1])
        specs[l] = s = dataclasses.replace(s, r=r)
    layer_params = []
    for l, s in enumerate(specs):
        w, scale, offset = raw[l]  # w: (kh, kw, c, o)
        rows_patch = s.kh + s.r - 1
        kdim = rows_patch * s.qxp * s.c
        m = s.r * P * s.o
        d2s2_last = tail == "d2s2" and l == len(specs) - 1
        if d2s2_last:
            # M order (px2, rr, py, px), channel = 2*py + px2: the px2
            # halves are contiguous M slices and whole dots store
            # contiguously (see _packed_kernel d2s2 tail). o == 4.
            wp = jnp.asarray(w).reshape(s.kh, s.kw, s.c, 2, 2)  # (.., py, px2)
            wm = jnp.zeros((rows_patch, s.qxp, s.c, 2, s.r, 2, P), w.dtype)
            for rr in range(s.r):
                for px in range(P):
                    wm = wm.at[
                        rr : rr + s.kh, px : px + s.kw, :, :, rr, :, px
                    ].set(wp.transpose(0, 1, 2, 4, 3))  # (.., px2, py)
            wmat = wm.reshape(kdim, m)
        else:
            wm = jnp.zeros((rows_patch, s.qxp, s.c, s.r, P, s.o), w.dtype)
            for rr in range(s.r):
                for px in range(P):
                    wm = wm.at[rr : rr + s.kh, px : px + s.kw, :, rr, px, :].set(w)
            wmat = wm.reshape(kdim, m)
        if wmat.dtype != jnp.int8:
            wmat = wmat.astype(act_dtype)
        layer_params.append({
            "wmat": wmat, "scale": scale, "offset": offset,
            "m_order": "d2s2" if d2s2_last else "std",
        })
    return layer_params, specs
