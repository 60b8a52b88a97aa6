"""Fused small-channel conv2d Pallas kernel (implicit GEMM, NHCW layout).

Why a custom kernel: ShaderNN's models are image-pipeline CNNs with tiny
channel counts (ESPCN is 1->16->16->4). XLA's TPU conv keeps C in the
lane (minor-most) dimension, so C=16 pads to 128 lanes and wastes ~8x of
both VMEM bandwidth and VPU work; measured ESPCN 540p runs ~6% of the HBM
roofline. This kernel instead uses an **NHCW** activation layout:

    (N, H, C, W):  C in sublanes (16 = the exact bf16 sublane tile),
                   W in lanes (tiles of 128) — zero padding waste.

Per grid step (one batch element, Th output rows):
  1. DMA the Th+k-1 input rows HBM -> VMEM (pipelined double buffer).
  2. For each output row: assemble the implicit-GEMM patch
     P[(k*k*C), W] from lane-shifted slices (cheap lane rotations +
     sublane concat in this layout),
  3. one MXU dot  Wmat[O, k*k*C] x P -> acc[O, W] (fp32 accumulate),
  4. fused epilogue  act(acc * scale + offset)  — covering bias, folded
     BatchNorm, and int8 weight dequant scales in one per-channel
     multiply-add, the TPU equivalent of the reference's generated shader
     epilogue (conv2dGL.cpp:666-833).

Supports stride 1 (odd/even kernels with the reference's asymmetric
"same" padding, conv2d.cpp:69-105), fp32/bf16/int8-weight compute. The
stride-2 phase-split path below compiles only in interpret mode — Mosaic
rejects its strided reshape on real TPUs — so pallas_conv_supported gates
stride 2 off on-device; stride-2 convs run on XLA or are folded to
stride 1 via the SpaceToDepth pass (graph/fusion.py).
The reference's MRT multi-pass channel chunking (conv2dGL.cpp:841-860) is
unnecessary here — O up to 128 fits one pass; larger O falls back to XLA.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shadernn_tpu.ops.common import apply_activation


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mxu_precision(compute_dtype):
    """f32 paths need 3-pass MXU passes (bf16x3) for fp32-grade results —
    the default single pass truncates operands to bf16 (~1e-3 error).
    bf16/int8 paths keep the fast default."""
    return jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None


def _conv_kernel(
    x_hbm,  # (N, Hp_in, C, Wp_in) in ANY/HBM
    w_ref,  # (K, O) VMEM — K = k*k*C in (dx, dy, c) order
    scale_ref,  # (O, 1) f32 VMEM
    offset_ref,  # (O, 1) f32 VMEM
    out_ref,  # block (1, Th, O, Wp_out) VMEM
    xs,  # scratch (2, rows, C, Wp_in) VMEM
    patch_ref,  # scratch (K, Wp_out) VMEM — implicit-GEMM patch
    sem,  # DMA semaphores (2,)
    *,
    k: int,
    stride: int,
    th: int,
    w_out: int,
    c: int,
    o: int,
    activation: str,
    alpha: float,
    n_h_tiles: int,
    wq_dtype,
):
    i = pl.program_id(1)
    rows = (th - 1) * stride + k

    def dma(slot, tile_idx):
        n = pl.program_id(0)
        r0 = tile_idx * th * stride
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(r0, rows)], xs.at[slot], sem.at[slot]
        )

    # Double-buffer across the H-tile grid dimension: kick off the next
    # tile's row DMA before computing this one.
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma(slot, i).start()

    @pl.when(i + 1 < n_h_tiles)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()

    wmat = w_ref[...]
    if wq_dtype is not None:
        wmat = wmat.astype(jnp.bfloat16)
    scale = scale_ref[...]  # (O, 1)
    offset = offset_ref[...]

    for r in range(th):  # static unroll over output rows in the tile
        # Assemble the implicit-GEMM patch by storing lane-shifted slabs
        # into a scratch buffer (stores perform the relayout; a value-level
        # concat of offset slices is not supported by Mosaic). dx-major K
        # order: one (k*C, W) slab store per dx — k stores per row instead
        # of k*k. All offsets are static (unrolled python ints). The weight
        # matrix rows follow the same (dx, dy, c) order.
        # Packed dtypes (bf16/int8, itemsize < 4): the (k, C, W) ->
        # (k*C, W) sublane-merging reshape of a row-offset slab load
        # MISCOMPILES on real TPUs (Mosaic emits collided sublane packs —
        # dy rows land on top of each other; found via impulse probe at
        # W<128 on the real chip). Store per-(dx, dy)
        # 2D pieces instead: each (C, W) store starts at a sublane-tile-
        # aligned row (C is padded to the dtype tile), no reshape needed.
        packed = xs.dtype.itemsize < 4
        if stride == 1:
            if packed:
                # load each input row separately as a 2D (C, Wp) value:
                # both the k-row 3D load at a row offset and its
                # (k, C, W) -> (k*C, W) reshape miscompile for packed
                # dtypes (sublane packs collide across dy)
                for dy in range(k):
                    row = xs[slot, r + dy]  # (C, Wp_in)
                    for dx in range(k):
                        patch_ref[
                            dx * k * c + dy * c : dx * k * c + (dy + 1) * c, :
                        ] = row[:, dx : dx + w_out]
            else:
                slab = xs[slot, r : r + k]  # (k, C, Wp_in)
                for dx in range(k):
                    piece = slab[:, :, dx : dx + w_out].reshape(k * c, w_out)
                    patch_ref[dx * k * c : (dx + 1) * k * c, :] = piece
        else:
            # strided lane gather: view W as (W/stride, stride) and take
            # the dx%stride phase starting at dx//stride.
            wp_in = xs.shape[-1]
            slab = xs[slot, r * stride : r * stride + k].reshape(
                k, c, wp_in // stride, stride
            )
            for dx in range(k):
                phase = dx % stride
                start = dx // stride
                piece = slab[:, :, start : start + w_out, phase].reshape(
                    k * c, w_out
                )
                patch_ref[dx * k * c : (dx + 1) * k * c, :] = piece
        acc = jax.lax.dot_general(
            wmat,
            patch_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(patch_ref.dtype),
        )  # (O, w_out)
        y = acc * scale + offset
        y = apply_activation(y, activation, alpha)
        out_ref[0, r] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "stride", "pads", "activation", "alpha", "block_rows",
        "interpret",
    ),
)
def fused_conv2d_nhcw(
    x,  # (N, H, C, W)
    w,  # (K, O) float or int8; K = k*k*C in (dx, dy, c) order
    scale,  # (O,) f32 — folded BN-scale * int8-dequant-scale
    offset,  # (O,) f32 — folded bias/BN offset
    *,
    kernel_size: int,
    stride: int = 1,
    pads: Tuple[int, int, int, int] = (0, 0, 0, 0),
    activation: str = "linear",
    alpha: float = 0.3,
    block_rows: int = 8,
    interpret: bool = False,
):
    """Returns (N, H_out, O, W_out) in NHCW, W_out padded to 128 lanes
    (garbage columns beyond the true output width are zero-input products;
    callers slice or carry the padding through a conv chain)."""
    n, h, c, wdim = x.shape
    k = kernel_size
    pt, pb, pl_, pr = pads
    kdim, o = w.shape
    assert kdim == k * k * c, (kdim, k, c)

    h_out = (h + pt + pb - k) // stride + 1
    w_out_true = (wdim + pl_ + pr - k) // stride + 1
    w_out = _round_up(max(w_out_true, 1), 128)
    th = min(block_rows, h_out)
    n_h_tiles = -(-h_out // th)
    h_out_p = n_h_tiles * th

    # Input geometry covering every tap of every (padded) output position.
    rows_needed = (h_out_p - 1) * stride + k
    w_in_needed = (w_out - 1) * stride + k
    if stride > 1:
        # the strided gather views Wp_in as (W/stride, stride)
        w_in_needed = _round_up(w_in_needed, stride)
    # Mosaic requires lane-dim (minor-most) extents aligned to 128 for the
    # sliced row DMA; the extra columns are never read by the patch builder.
    w_in_needed = _round_up(w_in_needed, 128)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (pt, max(rows_needed - h - pt, 0)),
            (0, 0),
            (pl_, max(w_in_needed - wdim - pl_, 0)),
        ),
    )

    out_dtype = x.dtype
    grid = (n, n_h_tiles)
    rows = (th - 1) * stride + k

    kernel = functools.partial(
        _conv_kernel,
        k=k, stride=stride, th=th, w_out=w_out, c=c, o=o,
        activation=activation, alpha=alpha, n_h_tiles=n_h_tiles,
        wq_dtype=jnp.int8 if w.dtype == jnp.int8 else None,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, o, w_out), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out_p, o, w_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, c, xp.shape[-1]), x.dtype),
            pltpu.VMEM((kdim, w_out), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * w_out * kdim * o,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + n * h_out_p * o * w_out * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        # The kernel uses TPU DMA semantics; CPU interpretation needs the
        # TPU interpreter, not the generic one.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xp, w, scale.reshape(o, 1).astype(jnp.float32),
      offset.reshape(o, 1).astype(jnp.float32))[:, :h_out]


# ---------------------------------------------------------------------------
# Haloed NHCW chain format: eliminates the per-conv pad/transpose copies.
#
# A HaloedValue carries (N, Hp, C_pad, Wp) with valid rows [MH, MH+H), valid
# lanes [ML, ML+W), zero margins. Each chain conv reads straight out of the
# margins (the zero padding is *already there* — the TPU analog of the
# reference keeping textures resident between render passes) and masks its
# own margins back to zero, so consecutive convs do no pad/slice/transpose
# work at all.

MH = 32  # row margin == chain tile height (see chain_pallas)
ML = 8  # lane margin


def _haloed_kernel(
    x_hbm,  # (N, Hp_in, C, Wp) ANY/HBM, zero margins
    w_ref,  # (K, r*O) VMEM, K in (dx, dy, c) order over kh+r-1 patch rows
    scale_ref,  # (r*O, 1) f32
    offset_ref,  # (r*O, 1) f32
    out_ref,  # block (1, Th, O, Wp)
    xs,  # scratch (2, Th + k - 1, C, Wp)
    patch_ref,  # scratch (K, Wp)
    sem,
    *,
    kh: int,
    kw: int,
    th: int,
    c: int,
    pt: int,
    pl_: int,
    h_out: int,
    w_out: int,
    wp: int,
    o_pad: int,
    r: int,
    activation: str,
    alpha: float,
    n_h_tiles: int,
    hp_in: int,
    dequant: bool,
):
    i = pl.program_id(1)
    rows = th + kh - 1
    rows_patch = kh + r - 1

    def dma(slot, tile_idx):
        n = pl.program_id(0)
        # Window start for out rows [tile*Th, tile*Th+Th): in rows jo-pt+dy.
        # Clamped (mis-aligned) windows only ever feed margin rows, which
        # are masked to zero below.
        start = jnp.clip(tile_idx * th - pt, 0, hp_in - rows)
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(start, rows)], xs.at[slot], sem.at[slot]
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

    wmat = w_ref[...]
    if dequant:
        wmat = wmat.astype(jnp.bfloat16)
    scale = scale_ref[...]
    offset = offset_ref[...]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    lane_mask = ((lane >= ML) & (lane < ML + w_out)).astype(jnp.float32)
    # sub-row id within the (r*o_pad, Wp) dot result (see chain_pallas:
    # r output rows share one contraction over kh+r-1 input rows)
    rid = jax.lax.broadcasted_iota(jnp.int32, (r * o_pad, 1), 0) // o_pad

    for t in range(-(-th // r)):
        j0 = min(t * r, th - r)  # overlapping tail recomputes same rows
        # Assemble the shared implicit-GEMM patch for rows [j0, j0+r).
        # Lane-offset stores (Mosaic has no bf16 rotate); the few stale
        # lanes at the unwritten edges land in the masked margins.
        slab = xs[slot, j0 : j0 + rows_patch]  # (rows_patch, C, Wp)
        kc = rows_patch * c
        for dx in range(kw):
            s = pl_ - dx
            base = dx * kc
            if s >= 0:
                patch_ref[base : base + kc, s:wp] = (
                    slab[:, :, : wp - s].reshape(kc, wp - s)
                )
            else:
                patch_ref[base : base + kc, : wp + s] = (
                    slab[:, :, -s:wp].reshape(kc, wp + s)
                )
        acc = jax.lax.dot_general(
            wmat, patch_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(patch_ref.dtype),
        )  # (r*O, Wp)
        jo = i * th + j0 + rid
        row_mask = ((jo >= MH) & (jo < MH + h_out)).astype(jnp.float32)
        y = acc * scale + offset
        y = apply_activation(y, activation, alpha)
        y = (y * (row_mask * lane_mask)).astype(out_ref.dtype)
        for rr in range(r):
            out_ref[0, j0 + rr] = y[rr * o_pad : (rr + 1) * o_pad]


MB = 40  # bottom row margin (covers DMA window overhang: pb + Th - 1)


@jax.tree_util.register_pytree_node_class
class HaloedValue:
    """An activation tensor living in the haloed NHCW chain format."""

    def __init__(self, arr, h: int, w: int, c: int):
        self.arr = arr  # (N, Hp, C_pad, Wp), zero margins
        self.h, self.w, self.c = h, w, c

    def tree_flatten(self):
        return (self.arr,), (self.h, self.w, self.c)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    def __repr__(self):
        return f"HaloedValue({self.arr.shape}, h={self.h}, w={self.w}, c={self.c})"


def _c_tile(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def to_haloed(x_nhwc) -> HaloedValue:
    """NHWC -> haloed NHCW: one transpose+pad at chain entry."""
    n, h, w, c = x_nhwc.shape
    ct = _c_tile(x_nhwc.dtype)
    c_pad = _round_up(c, ct)
    wp = _round_up(ML + w + 8, 128)
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))  # NCHW
    x = jnp.pad(
        x, ((0, 0), (0, c_pad - c), (MH, MB), (ML, wp - ML - w))
    )  # (N, C_pad, Hp, Wp)
    return HaloedValue(jnp.transpose(x, (0, 2, 1, 3)), h, w, c)


def from_haloed(hv: HaloedValue):
    """Haloed NHCW -> NHWC at chain exit."""
    y = hv.arr[:, MH : MH + hv.h, : hv.c, ML : ML + hv.w]
    return jnp.transpose(y, (0, 1, 3, 2))


def fused_conv2d_haloed(
    hv: HaloedValue,
    w_hwio,  # (kh, kw, C, O) float or int8 — rectangular kernels supported
    scale,  # (O,)
    offset,  # (O,)
    *,
    stride: int = 1,
    pads: Tuple[int, int, int, int] = (0, 0, 0, 0),
    activation: str = "linear",
    alpha: float = 0.3,
    block_rows: int = MH,
    interpret: bool = False,
) -> HaloedValue:
    """Chain conv: haloed in, haloed out, zero glue copies. Stride 1 only;
    margins bound the supported padding (pt <= MH, pl <= ML=8, pb <= 9)."""
    assert stride == 1
    pt, pb, pl_, pr = pads
    assert pt <= MH and pl_ <= ML and pb <= 9 and pr <= 8, pads
    x = hv.arr
    n, hp_in, c_pad, wp = x.shape
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    o = w_hwio.shape[3]
    assert w_hwio.shape[2] == hv.c

    ct = _c_tile(x.dtype)
    o_pad = _round_up(o, ct)
    if w_hwio.shape[2] != c_pad or o != o_pad:
        w_hwio = jnp.pad(
            w_hwio, ((0, 0), (0, 0), (0, c_pad - hv.c), (0, o_pad - o))
        )
    # Padded output channels: scale 1 / offset 0 so garbage stays finite
    # (and exactly 0 for relu/tanh-family activations).
    scale = jnp.concatenate(
        [scale.reshape(-1).astype(jnp.float32), jnp.ones((o_pad - o,), jnp.float32)]
    )
    offset = jnp.concatenate(
        [offset.reshape(-1).astype(jnp.float32), jnp.zeros((o_pad - o,), jnp.float32)]
    )
    # r-row dot batching (see chain_pallas.ChainLayerSpec.r): rows
    # [j0, j0+r) share one contraction over kh+r-1 input rows, so sub-row
    # rr's weights sit at dy-offset rr and column block rr.
    r = max(1, min(block_rows, 128 // o_pad))
    rows_patch = kh + r - 1
    w_t = jnp.transpose(w_hwio, (1, 0, 2, 3))  # (kw, kh, c_pad, o_pad)
    blocks = [
        jnp.pad(w_t, ((0, 0), (rr, rows_patch - kh - rr), (0, 0), (0, 0)))
        for rr in range(r)
    ]
    wmat = jnp.moveaxis(jnp.stack(blocks, axis=-1), -1, -2).reshape(
        kw * rows_patch * c_pad, r * o_pad
    )
    scale = jnp.tile(scale, r)
    offset = jnp.tile(offset, r)

    h_out = hv.h + pt + pb - kh + 1
    w_out = hv.w + pl_ + pr - kw + 1
    th = block_rows
    assert th == MH, "tile height must equal the top margin"
    hp_out = MH + h_out + MB
    n_h_tiles = -(-hp_out // th)
    hp_out = n_h_tiles * th

    kernel = functools.partial(
        _haloed_kernel,
        kh=kh, kw=kw, th=th, c=c_pad, pt=pt, pl_=pl_, h_out=h_out,
        w_out=w_out, wp=wp, o_pad=o_pad, r=r, activation=activation,
        alpha=alpha, n_h_tiles=n_h_tiles, hp_in=hp_in,
        dequant=w_hwio.dtype == jnp.int8,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, n_h_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, o_pad, wp), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp_out, o_pad, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, c_pad, wp), x.dtype),
            pltpu.VMEM((kw * rows_patch * c_pad, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * wp * kh * kw * c_pad * o_pad,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * hp_out * o_pad * wp * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, wmat, scale.reshape(-1, 1), offset.reshape(-1, 1))
    return HaloedValue(out, h_out, w_out, o)


def to_haloed_rowpacked(x_nhwc, kh: int, pt: int, pb: int) -> HaloedValue:
    """Row-packing for single-channel inputs: fold the kh vertical taps
    into the channel dimension, so a kh x kw conv on C=1 becomes a 1 x kw
    conv on C=kh.

    Why: the kernel's dot is K-pass bound and C pads to the 16-sublane
    tile, so C=1 inflates K by 16x (ESPCN's 5x5 stem: K=400 instead of
    25). Packing X'[h, dy, w] = x[h + dy - pt, w] gives K = kw*16 with
    kh<=16 taps occupying the once-wasted slots (5x5 stem: K=80 — 5x
    fewer MXU passes). Vertical padding is baked into X', so the packed
    conv runs with pads (0, 0, pl, pr).
    """
    n, h, w, c = x_nhwc.shape
    assert c == 1, "row packing is for single-channel inputs"
    h_out = h + pt + pb - kh + 1
    ct = _c_tile(x_nhwc.dtype)
    c_pad = _round_up(kh, ct)
    wp = _round_up(ML + w + 8, 128)
    # Build straight into NHCW: stacking the dy-shifts on axis 2 IS the
    # channel dimension — no transposes (a minor-dim-5 transpose is a slow
    # path on TPU).
    y = jnp.pad(x_nhwc[..., 0], ((0, 0), (pt, pb), (ML, wp - ML - w)))
    packed = jnp.stack(
        [y[:, dy : dy + h_out] for dy in range(kh)], axis=2
    )  # (N, h_out, kh, Wp)
    packed = jnp.pad(packed, ((0, 0), (MH, MB), (0, c_pad - kh), (0, 0)))
    return HaloedValue(packed, h_out, w, kh)


def rowpack_weights(w_hwio):
    """(kh, kw, 1, O) -> (1, kw, kh, O): w'[0, dx, dy, o] = w[dy, dx, 0, o]."""
    return jnp.transpose(w_hwio[:, :, 0, :], (1, 0, 2))[None]


# ---------------------------------------------------------------------------
# NHWC wrapper used by the Conv2D op's PALLAS backend.

def conv2d_pallas_nhwc(
    x_nhwc,
    w_hwio,
    scale,
    offset,
    *,
    stride: int = 1,
    pads=(0, 0, 0, 0),
    activation: str = "linear",
    alpha: float = 0.3,
    interpret: bool = False,
):
    """NHWC in / NHWC out convenience wrapper: transposes to NHCW, runs the
    fused kernel, transposes back and crops lane padding. Chained pallas
    convs should stay in NHCW instead (see engine layout planning)."""
    n, h, wdim, c = x_nhwc.shape
    k = w_hwio.shape[0]
    o = w_hwio.shape[3]
    # Mosaic requires sublane slices aligned to the dtype's sublane tile
    # (e.g. C=1 inputs fail); pad channels up to the tile and zero-pad the
    # matching weight rows (zero contributions).
    c_tile = 16 if x_nhwc.dtype == jnp.bfloat16 else 8
    c_pad = _round_up(c, c_tile)
    if c_pad != c:
        x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        w_hwio = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
        c = c_pad
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))  # NHCW
    # K rows in (dx, dy, c) order to match the kernel's dx-major slab stores.
    wmat = jnp.transpose(w_hwio, (1, 0, 2, 3)).reshape(k * k * c, o)
    y = fused_conv2d_nhcw(
        x, wmat, scale, offset,
        kernel_size=k, stride=stride, pads=tuple(pads),
        activation=activation, alpha=alpha, interpret=interpret,
    )
    pt, pb, pl_, pr = pads
    w_out_true = (wdim + pl_ + pr - k) // stride + 1
    y = y[:, :, :, :w_out_true]
    return jnp.transpose(y, (0, 1, 3, 2))  # back to NHWC
