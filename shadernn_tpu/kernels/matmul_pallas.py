"""Fused matmul Pallas kernel (Dense layer / classifier heads).

Replaces the reference's dense compute shader (shadertemplate_cs_dense.glsl,
denselayerGL.cpp) and its Eigen CPU fallback (denselayer.cpp:27) with one
MXU matmul plus a fused per-output-channel epilogue:

    y = act( (x @ W) * scale + offset )

scale/offset fold bias, BatchNorm, and int8 weight-only dequantization
scales — same epilogue contract as the conv kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shadernn_tpu.kernels.conv_pallas import _mxu_precision

from shadernn_tpu.ops.common import apply_activation


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _matmul_kernel(x_ref, w_ref, scale_ref, offset_ref, out_ref, acc_ref, *,
                   activation: str, alpha: float, n_k_tiles: int, dequant: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wt = w_ref[...]
    if dequant:
        wt = wt.astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(x_ref.dtype),
    )

    @pl.when(ki == n_k_tiles - 1)
    def _():
        y = acc_ref[...] * scale_ref[...] + offset_ref[...]
        y = apply_activation(y, activation, alpha)
        out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "alpha", "block_m", "block_n", "block_k",
                     "interpret"),
)
def fused_matmul(
    x,  # (M, K)
    w,  # (K, N) float or int8
    scale,  # (N,) f32
    offset,  # (N,) f32
    *,
    activation: str = "linear",
    alpha: float = 0.3,
    block_m: int = 128,
    block_n: int = 128,
    block_k: int = 512,
    interpret: bool = False,
):
    m, kdim = x.shape
    _, n = w.shape
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(kdim, 128))
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(kdim, bk)
    if (mp, kp) != (m, kdim):
        x = jnp.pad(x, ((0, mp - m), (0, kp - kdim)))
    if (kp, np_) != (kdim, n):
        w = jnp.pad(w, ((0, kp - kdim), (0, np_ - n)))
    if np_ != n:
        scale = jnp.pad(scale, (0, np_ - n))
        offset = jnp.pad(offset, (0, np_ - n))

    grid = (mp // bm, np_ // bn, kp // bk)
    kernel = functools.partial(
        _matmul_kernel,
        activation=activation, alpha=alpha, n_k_tiles=grid[2],
        dequant=w.dtype == jnp.int8,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize + kp * np_ * w.dtype.itemsize
            + mp * np_ * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, scale.reshape(1, -1).astype(jnp.float32),
      offset.reshape(1, -1).astype(jnp.float32))
    return out[:m, :n]
