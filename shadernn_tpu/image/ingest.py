"""On-device frame ingest: the zero-copy texture path, TPU style.

The reference's defining feature is texture-based zero-copy I/O — camera
frames stay on the GPU from capture to inference (README.md:11,
imageTexture.h attach/upload). The TPU equivalent: raw uint8 frames are
DMA'd to HBM once, and ALL preprocessing (dtype conversion, YUV->RGB,
normalization, resize, layout) runs on-device inside the same jitted
program as the model, so frames live in HBM end to end
(BASELINE.json north_star "on-device image-tensor ingest pipeline").
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 limited-range YUV -> RGB (matches image/color.py host version).
_YUV_M = jnp.asarray(
    [[1.164, 0.0, 1.596], [1.164, -0.392, -0.813], [1.164, 2.017, 0.0]],
    jnp.float32,
)


def nv12_to_rgb_device(y_plane, uv_plane, nv21: bool = False):
    """(N,H,W) uint8 Y + (N,H/2,W/2,2) uint8 UV -> (N,H,W,3) float RGB
    in [0,255]. All on device."""
    y = y_plane.astype(jnp.float32) - 16.0
    uv = uv_plane.astype(jnp.float32) - 128.0
    u = uv[..., 1] if nv21 else uv[..., 0]
    v = uv[..., 0] if nv21 else uv[..., 1]
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    yuv = jnp.stack([y, u, v], axis=-1)
    rgb = yuv @ _YUV_M.T
    return jnp.clip(rgb, 0.0, 255.0)


@functools.partial(
    jax.jit,
    static_argnames=("target_hw", "means", "norms", "dtype_name", "resize_method"),
)
def ingest_frames(
    frames,  # (N, H, W, C) uint8 (or float)
    target_hw: Optional[Tuple[int, int]] = None,
    means: Tuple[float, ...] = (0.0,),
    norms: Tuple[float, ...] = (1 / 255.0,),
    dtype_name: str = "bfloat16",
    resize_method: str = "linear",
):
    """uint8 frames -> normalized NHWC model input, fully on device.

    Covers the reference's upload + convertToRGBA32FAndNormalize + GPU
    resize path (imageTexture.cpp:51-227, imageTextureGL GPU resize) as one
    fused XLA program. means/norms follow RawImage::normalize semantics:
    y = (x - mean) * norm.
    """
    x = frames.astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.asarray((list(means) * c)[:c], jnp.float32)
    norm = jnp.asarray((list(norms) * c)[:c], jnp.float32)
    x = (x - mean) * norm
    if target_hw is not None and tuple(target_hw) != tuple(x.shape[1:3]):
        n, _, _, cc = x.shape
        x = jax.image.resize(
            x, (n, target_hw[0], target_hw[1], cc),
            method="nearest" if resize_method == "nearest" else "bilinear",
        )
    return x.astype(jnp.dtype(dtype_name))


def make_ingest_fn(
    engine,
    means: Sequence[float] = (0.0,),
    norms: Sequence[float] = (1 / 255.0,),
    resize_from: Optional[Tuple[int, int]] = None,
):
    """Build a jitted (uint8 frames) -> model outputs step that fuses ingest
    and inference into ONE XLA program — the full zero-copy pipeline."""
    graph = engine.graph
    (in_name,) = graph.input_names
    spec = graph.nodes[in_name].out_spec
    target_hw = (spec.h, spec.w)
    forward = engine.model.forward
    params = engine.model.params

    @jax.jit
    def step(raw_frames):
        x = ingest_frames(
            raw_frames,
            target_hw=target_hw if resize_from else None,
            means=tuple(means),
            norms=tuple(norms),
            dtype_name="float32",
        )
        return forward(params, {in_name: x})

    return step
