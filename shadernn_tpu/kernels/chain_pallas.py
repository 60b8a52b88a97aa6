"""Fused conv-chain kernel: an entire stride-1 conv chain in ONE pallas
kernel, intermediates living only in VMEM.

This is the speed-of-light design for small-channel CNNs and the true TPU
analog of ShaderNN's whole-pipeline-on-GPU execution: where the per-conv
haloed kernel (conv_pallas.py) round-trips every intermediate activation
through HBM (~166 MB per layer for 540p/16ch at batch 8), the chain kernel
reads the input rows once per spatial tile, pushes them through every conv
in VMEM scratch (recomputing the small row-halos of intermediates per
tile — the classic fused-pipeline tradeoff), and writes only the final
output. HBM traffic collapses from O(layers) to O(input+output).

Row bookkeeping: for final-output rows [t*Th, t*Th+Th) (margin-inclusive
coordinate jo), layer l must produce rows offset by its accumulated top
pads: A_L = 0, A_{l-1} = A_l + pt_l. With every layer's scratch indexed so
local row j = global row jo - (t*Th - A_l), layer l's window for its row j
is exactly rows [j, j+kh_l) of layer l-1's scratch — no per-layer shifts.

Layer-1 C=1 inputs use a 2D (H-in-sublanes) f32 layout so the patch is
built from kh-row sublane slices: K = kh*kw (e.g. 25 for a 5x5 stem)
instead of kh*kw*16 with a tile-padded channel.
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
    MB, MH, ML, HaloedValue, _c_tile, _mxu_precision, _round_up,
)
from shadernn_tpu.ops.common import apply_activation


@dataclasses.dataclass(frozen=True)
class ChainLayerSpec:
    """Static description of one conv in the chain (weights passed
    separately as kernel operands)."""

    kh: int
    kw: int
    c: int  # true input channels
    c_pad: int  # padded (0 => layer-1 2D C=1 form)
    o: int
    o_pad: int
    pt: int
    pb: int
    pl: int
    pr: int
    activation: str
    alpha: float
    # Output rows produced per MXU dot. Small-channel convs leave the MXU's
    # M dimension mostly idle (o_pad=16 -> 12.5%); batching r consecutive
    # output rows into one dot shares the contraction over the overlapping
    # kh+r-1 input rows (M = r*o_pad, K = kw*(kh+r-1)*c_pad), cutting
    # K-passes per output row by up to kh*r/(kh+r-1) ~ 4x for 3x3 convs.
    r: int = 1


def _plan_rows(specs: Sequence[ChainLayerSpec], th: int):
    """A_l (accumulated top pads below layer l) and rows_l per layer."""
    n = len(specs)
    a = [0] * (n + 1)
    b = [0] * (n + 1)
    for l in range(n - 1, -1, -1):
        a[l] = a[l + 1] + specs[l].pt
        b[l] = b[l + 1] + (specs[l].kh - 1 - specs[l].pt)
    rows = [th + a[l] + b[l] for l in range(n + 1)]  # index 0 = input
    return a, rows


def _chain_kernel(
    x_hbm,  # (N, Hp_in, Wp) f32 2D-rows  OR  (N, Hp_in, C_pad, Wp)
    *refs,  # per-layer (w, scale, offset) + out_ref + scratches + sem
    specs: Tuple[ChainLayerSpec, ...],
    th: int,
    wp: int,
    h_list: Tuple[int, ...],  # per-layer output valid heights
    w_list: Tuple[int, ...],  # per-layer output valid widths
    a_offsets: Tuple[int, ...],
    rows_list: Tuple[int, ...],
    n_h_tiles: int,
    hp_in: int,
    first_2d: bool,
    compute_dtype,
    tail: str,  # "none" | "c1" | "d2s2" (see fused_conv_chain)
):
    nlayers = len(specs)
    w_refs = refs[0:nlayers]
    scale_refs = refs[nlayers : 2 * nlayers]
    offset_refs = refs[2 * nlayers : 3 * nlayers]
    out_ref = refs[3 * nlayers]
    xs = refs[3 * nlayers + 1]  # input scratch (2, rows_0, [C,] Wp)
    layer_scratch = refs[3 * nlayers + 2 : 3 * nlayers + 1 + nlayers]
    patch_ref = refs[3 * nlayers + 1 + nlayers]
    sem = refs[-1]

    i = pl.program_id(1)
    rows0 = rows_list[0]
    if first_2d:
        # H is the sublane (tiled) dim of the 2D input, so HBM slice
        # starts must be 8-aligned: window starts at 8*(i-1) and the
        # logical offset inside the scratch is the constant delta below
        # (clamped tiles only ever feed masked margin rows).
        rows_dma = _round_up(rows0 + th, 8)
        delta = th - a_offsets[0]
        assert delta >= 0
    else:
        rows_dma = rows0
        delta = 0

    def dma(slot, tile_idx):
        n = pl.program_id(0)
        if first_2d:
            # every branch of the clip is a multiple of 8; hint the prover
            start = pl.multiple_of(
                jnp.clip(th * (tile_idx - 1), 0, hp_in - rows_dma), 8
            )
        else:
            start = jnp.clip(tile_idx * th - a_offsets[0], 0, hp_in - rows_dma)
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(start, rows_dma)], xs.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma(slot, i).start()

    @pl.when(i + 1 < n_h_tiles)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)

    for l, spec in enumerate(specs):
        wmat = w_refs[l][...]
        if wmat.dtype == jnp.int8:
            wmat = wmat.astype(compute_dtype)
        scale = scale_refs[l][...]  # (r*o_pad, 1)
        offset = offset_refs[l][...]
        kdim = wmat.shape[0]
        last = l == nlayers - 1
        out_rows = rows_list[l + 1]
        r = spec.r
        rows_patch = spec.kh + r - 1
        # Every layer masks its own zero-padding region: margin rows/lanes
        # must be EXACT zeros because they are the next conv's padding.
        lane_mask = ((lane >= ML) & (lane < ML + w_list[l])).astype(jnp.float32)
        # sub-row id within the (r*o_pad, Wp) dot result, for row masking
        rid = (
            jax.lax.broadcasted_iota(jnp.int32, (r * spec.o_pad, 1), 0)
            // spec.o_pad
        )
        n_dots = -(-out_rows // r)
        for t in range(n_dots):
            # overlapping tail tile recomputes identical rows
            j0 = min(t * r, out_rows - r)
            # assemble the shared patch for output rows [j0, j0+r)
            if l == 0 and first_2d:
                slab = xs[slot, delta + j0 : delta + j0 + rows_patch]  # (rows_patch, Wp) f32
                for dx in range(spec.kw):
                    s = spec.pl - dx
                    base = dx * rows_patch
                    if s >= 0:
                        patch_ref[base : base + rows_patch, s:wp] = (
                            slab[:, : wp - s].astype(compute_dtype)
                        )
                    else:
                        patch_ref[base : base + rows_patch, : wp + s] = (
                            slab[:, -s:wp].astype(compute_dtype)
                        )
            else:
                if l == 0:
                    slab = xs[slot, j0 : j0 + rows_patch]  # (rows_patch, C_pad, Wp)
                else:
                    slab = layer_scratch[l - 1][j0 : j0 + rows_patch]
                kc = rows_patch * spec.c_pad
                for dx in range(spec.kw):
                    s = spec.pl - dx
                    base = dx * kc
                    if s >= 0:
                        patch_ref[base : base + kc, s:wp] = (
                            slab[:, :, : wp - s].reshape(kc, wp - s).astype(compute_dtype)
                        )
                    else:
                        patch_ref[base : base + kc, : wp + s] = (
                            slab[:, :, -s:wp].reshape(kc, wp + s).astype(compute_dtype)
                        )
            acc = jax.lax.dot_general(
                wmat,
                patch_ref[:kdim, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )  # (r*O_pad, Wp)
            y = acc * scale + offset
            y = apply_activation(y, spec.activation, spec.alpha)
            # global rows of this layer-l output block
            g0 = i * th - a_offsets[l + 1] + j0
            row_mask = ((g0 + rid >= MH) & (g0 + rid < MH + h_list[l])).astype(
                jnp.float32
            )
            y = y * (row_mask * lane_mask)
            if last and tail == "c1":
                # 2D-row tail: single-channel output written as (Th, Wp)
                # rows, skipping the o_pad channel padding entirely.
                yc = y.astype(out_ref.dtype)
                for rr in range(r):
                    out_ref[0, j0 + rr] = yc[rr * spec.o_pad]
            elif last and tail == "d2s2":
                # Fused depth_to_space(2) tail for o=4 -> 1 heads: channel
                # (py*2+px) lands at output (2g+py, 2i+px). Lane interleave
                # via bf16-pair bitcast into one uint32 lane (little-endian:
                # low half = even lane).
                yb = y.astype(jnp.bfloat16)

                def pack(u, v):
                    u16 = jax.lax.bitcast_convert_type(u, jnp.uint16)
                    v16 = jax.lax.bitcast_convert_type(v, jnp.uint16)
                    return u16.astype(jnp.uint32) | (
                        v16.astype(jnp.uint32) << 16
                    )

                for rr in range(r):
                    base = rr * spec.o_pad
                    top = pack(yb[base : base + 1], yb[base + 1 : base + 2])
                    bot = pack(yb[base + 2 : base + 3], yb[base + 3 : base + 4])
                    out_ref[0, 2 * (j0 + rr)] = top[0]
                    out_ref[0, 2 * (j0 + rr) + 1] = bot[0]
            else:
                yc = y.astype(out_ref.dtype if last else compute_dtype)
                for rr in range(r):
                    blk = yc[rr * spec.o_pad : (rr + 1) * spec.o_pad]
                    if last:
                        out_ref[0, j0 + rr] = blk
                    else:
                        layer_scratch[l][j0 + rr] = blk


def fused_conv_chain(
    x,  # (N, H, W, 1) NHWC for first_2d, or HaloedValue
    layer_params: List[dict],  # per layer: wmat (K,O_pad), scale, offset (O_pad,)
    specs: List[ChainLayerSpec],
    *,
    block_rows: int = MH,
    interpret: bool = False,
    tail: str = "none",
):
    """Run the whole chain.

    tail:
      - "none": return the final layer's HaloedValue (o_pad channels).
      - "c1":   final layer has o=1; write single-channel 2D rows and
                return NHWC (N, H, W, 1) directly — skips the 16x o_pad
                write amplification of the NHCW format.
      - "d2s2": final layer has o=4 feeding depth_to_space(2); fuse the
                subpixel into the kernel (bf16 lane pairs packed as
                uint32) and return NHWC (N, 2H, 2W, 1).
    """
    nlayers = len(specs)
    th = block_rows
    assert th == MH

    first_2d = specs[0].c_pad == 0
    if first_2d:
        n, h, wdim, c = x.shape
        assert c == 1
        wp = _round_up(ML + wdim + 8, 128)
        # H is the sublane dim here: pad total height to a multiple of 8 so
        # the aligned DMA windows (see _chain_kernel) stay in bounds.
        mb = _round_up(MH + h + MB, 8) - MH - h
        xp = jnp.pad(
            x[..., 0].astype(jnp.float32),
            ((0, 0), (MH, mb), (ML, wp - ML - wdim)),
        )  # (N, Hp, Wp)
        hv_h, hv_w = h, wdim
        compute_dtype = jnp.bfloat16 if x.dtype in (jnp.bfloat16,) else jnp.float32
    else:
        assert isinstance(x, HaloedValue)
        xp = x.arr
        hv_h, hv_w = x.h, x.w
        wp = xp.shape[-1]
        compute_dtype = xp.dtype

    # output geometry through the chain (per-layer valid sizes for masking)
    h_list, w_list = [], []
    h_out, w_out = hv_h, hv_w
    for s in specs:
        h_out = h_out + s.pt + s.pb - s.kh + 1
        w_out = w_out + s.pl + s.pr - s.kw + 1
        h_list.append(h_out)
        w_list.append(w_out)

    a_off, rows_list = _plan_rows(specs, th)
    hp_in = xp.shape[1]
    o_last = specs[-1].o_pad
    hp_out = MH + h_out + MB
    n_h_tiles = -(-hp_out // th)
    hp_out = n_h_tiles * th

    max_k = max(
        (s.kh + s.r - 1) * s.kw * (1 if (i == 0 and first_2d) else s.c_pad)
        for i, s in enumerate(specs)
    )

    assert tail in ("none", "c1", "d2s2")
    if tail == "c1":
        assert specs[-1].o == 1
    if tail == "d2s2":
        assert specs[-1].o == 4 and compute_dtype == jnp.bfloat16

    kernel = functools.partial(
        _chain_kernel,
        specs=tuple(specs),
        th=th, wp=wp, h_list=tuple(h_list), w_list=tuple(w_list),
        a_offsets=tuple(a_off), rows_list=tuple(rows_list),
        n_h_tiles=n_h_tiles, hp_in=hp_in, first_2d=first_2d,
        compute_dtype=compute_dtype, tail=tail,
    )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [xp]
    for p in layer_params:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(p["wmat"])
    for p, s in zip(layer_params, specs):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(
            jnp.tile(p["scale"].reshape(-1), s.r).reshape(-1, 1).astype(jnp.float32)
        )
    for p, s in zip(layer_params, specs):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(
            jnp.tile(p["offset"].reshape(-1), s.r).reshape(-1, 1).astype(jnp.float32)
        )

    if first_2d:
        rows_dma = _round_up(rows_list[0] + th, 8)
        xs_scratch = pltpu.VMEM((2, rows_dma, wp), jnp.float32)
    else:
        xs_scratch = pltpu.VMEM((2, rows_list[0], specs[0].c_pad, wp), compute_dtype)
    scratches = [xs_scratch]
    for l in range(nlayers - 1):
        scratches.append(
            pltpu.VMEM((rows_list[l + 1], specs[l].o_pad, wp), compute_dtype)
        )
    scratches.append(pltpu.VMEM((max_k, wp), compute_dtype))
    scratches.append(pltpu.SemaphoreType.DMA((2,)))

    if tail == "c1":
        out_specs = pl.BlockSpec(
            (1, th, wp), lambda ni, hi: (ni, hi, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct(
            (xp.shape[0], hp_out, wp), compute_dtype
        )
    elif tail == "d2s2":
        out_specs = pl.BlockSpec(
            (1, 2 * th, wp), lambda ni, hi: (ni, hi, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (xp.shape[0], 2 * hp_out, wp), jnp.uint32
        )
    else:
        out_specs = pl.BlockSpec(
            (1, th, o_last, wp), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (xp.shape[0], hp_out, o_last, wp), compute_dtype
        )
    out = pl.pallas_call(
        kernel,
        grid=(xp.shape[0], n_h_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*operands)
    if tail == "c1":
        return out[:, MH : MH + h_out, ML : ML + w_out][..., None]
    if tail == "d2s2":
        half = jax.lax.bitcast_convert_type(out, jnp.bfloat16)
        # (N, 2Hp, Wp, 2) -> interleaved lanes (N, 2Hp, 2Wp)
        half = half.reshape(out.shape[0], out.shape[1], 2 * wp)
        return half[
            :, 2 * MH : 2 * (MH + h_out), 2 * ML : 2 * (ML + w_out)
        ][..., None]
    return HaloedValue(out, h_out, w_out, specs[-1].o)


# ---------------------------------------------------------------------------
# Graph-level construction


def build_chain(
    nodes, in_channels: int, act_dtype, allow_2d_head: bool = True,
    act_override: Optional[Tuple[str, float]] = None,
) -> Optional[Tuple[list, list]]:
    """Build (layer_params, specs) for a run of Conv2D nodes, or None if
    unsupported. First layer may be the C=1 2D form.

    act_override = (name, alpha): replace the LAST layer's (linear)
    activation with a folded elementwise Activation-node epilogue — e.g.
    ESPCN's post-subpixel tanh runs inside the kernel at f32 instead of
    as a separate full-resolution XLA pass (engine/compile.py plans it)."""
    from shadernn_tpu.ops.common import padding_offsets
    from shadernn_tpu.ops.conv import epilogue_scale_offset

    weights, scales, offsets, specs = [], [], [], []
    c = in_channels
    # Sublane tile must match the activation layout to_haloed() produces
    # (8 for f32, 16 for bf16) or the input DMA shapes mismatch.
    ct = _c_tile(jnp.dtype(act_dtype))
    for idx, node in enumerate(nodes):
        k = int(node.attr("kernel_size"))
        pt, pb, pl_, pr = padding_offsets(node.attr("padding", "same"), k)
        o = int(node.attr("out_channels"))
        scale, offset = epilogue_scale_offset(node)
        if "weight_q" in node.params:
            w = jnp.asarray(node.params["weight_q"])
        else:
            w = jnp.asarray(node.params["weight"], act_dtype)
        first_2d = idx == 0 and c == 1 and k >= 2 and allow_2d_head
        # (An unpadded tail output — O=4 writing 4 sublanes — was tried and
        # compiled pathologically slowly in Mosaic; keep the tile-padded O.)
        o_pad = _round_up(o, ct)
        if first_2d:
            w = jnp.transpose(w[:, :, 0, :], (1, 0, 2))  # (kw, kh, o)
            c_pad = 0
        else:
            c_pad = _round_up(c, ct)
            if c_pad != c:
                w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
            w = jnp.transpose(w, (1, 0, 2, 3))  # (kw, kh, c_pad, o)
        if o != o_pad:
            w = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, o_pad - o)])
            scale = jnp.concatenate([scale.reshape(-1), jnp.ones(o_pad - o)])
            offset = jnp.concatenate([offset.reshape(-1), jnp.zeros(o_pad - o)])
        weights.append(w)
        scales.append(scale)
        offsets.append(offset)
        act = node.attr("activation", "linear")
        alpha = float(node.attr("leaky_alpha", 0.3))
        if act_override is not None and idx == len(nodes) - 1:
            act, alpha = act_override
        specs.append(
            ChainLayerSpec(
                kh=k, kw=k, c=c, c_pad=c_pad, o=o, o_pad=o_pad,
                pt=pt, pb=pb, pl=pl_, pr=pr,
                activation=act, alpha=alpha,
            )
        )
        c = o
    # Geometry + VMEM gates. DMA-window analysis (see _chain_kernel): the
    # accumulated top pads must fit the top margin (A_0 <= MH) and the
    # accumulated bottom halo must fit the bottom margin minus the tile
    # overhang (B_0 <= MB - th + 1).
    th = MH
    a_off, rows = _plan_rows(specs, th)
    b0 = rows[0] - th - a_off[0]
    if a_off[0] > MH or b0 > MB - th + 1:
        return None
    bytes_needed = 0
    for l in range(len(specs) - 1):
        bytes_needed += rows[l + 1] * specs[l].o_pad * jnp.dtype(act_dtype).itemsize
    if bytes_needed * 1300 > 60 * 1024 * 1024:  # x wp lanes (~1.2k) budget
        return None
    # Pick the per-dot row batch r and lay out the block weight matrix
    # (see ChainLayerSpec.r): rows [j0, j0+r) share one contraction over
    # input rows [j0, j0+kh+r-1), so sub-row rr's weights sit at dy-offset
    # rr inside the (kw, kh+r-1, [c_pad,]) patch and at column block rr.
    layer_params = []
    for l, spec in enumerate(specs):
        r = max(1, min(8, 128 // spec.o_pad, rows[l + 1]))
        rows_patch = spec.kh + r - 1
        w = weights[l]  # (kw, kh, [c_pad,] o_pad)
        blocks = [
            jnp.pad(
                w, [(0, 0), (rr, rows_patch - spec.kh - rr)]
                + [(0, 0)] * (w.ndim - 2)
            )
            for rr in range(r)
        ]
        wmat = jnp.stack(blocks, axis=-1)  # (kw, rows_patch, [c_pad,] o_pad? ...)
        # stack puts r before o_pad? axis=-1 appends after o_pad; we need
        # (..., r, o_pad) so the flattened M order is (r, o) — move it.
        wmat = jnp.moveaxis(wmat, -1, -2)
        kdim = spec.kw * rows_patch * (spec.c_pad if spec.c_pad else 1)
        wmat = wmat.reshape(kdim, r * spec.o_pad)
        layer_params.append(
            {"wmat": wmat, "scale": scales[l], "offset": offsets[l]}
        )
        specs[l] = dataclasses.replace(spec, r=r)
    return layer_params, specs
