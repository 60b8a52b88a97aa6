"""Explicit halo-exchange convolution for spatial partitioning.

The north-star mechanism (BASELINE.json): large frames are split across
chips along H; each conv needs its neighbors' boundary rows (the receptive
-field halo), exchanged over ICI with `ppermute` and overlapped with
compute. Structurally this is ring attention's neighbor exchange applied
to image tiles (SURVEY.md §5); the reference's analog is the per-shader
padding handling (conv2d.cpp:99-133) lifted from "texture borders on one
GPU" to "tile borders across chips".

Two layers:
- `halo_exchange(x, halo_up, halo_dn, axis)`: shard_map-level primitive
  sending boundary rows to both neighbors (edge shards get zeros — the
  conv's zero padding).
- `halo_conv2d`: the full spatially-sharded conv. The local conv is split
  into interior (needs no halo) and border strips, with the interior
  computed while the ppermute is in flight — XLA's scheduler overlaps the
  independent collective with the interior conv.

Used by shard_map programs; GSPMD auto-sharding remains the fallback path
(parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shift_from_lower(x_rows, axis_name: str):
    """Each shard receives the LAST rows of its upper neighbor (shard i-1);
    shard 0 receives zeros."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x_rows, axis_name, perm)


def _shift_from_upper(x_rows, axis_name: str):
    """Each shard receives the FIRST rows of its lower neighbor (shard
    i+1); the last shard receives zeros."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    return jax.lax.ppermute(x_rows, axis_name, perm)


def halo_exchange(x, halo_up: int, halo_dn: int, axis_name: str,
                  fill: float = 0.0):
    """Concatenate neighbor boundary rows around the local H-shard.

    x: (N, H_local, W, C) inside shard_map. Returns
    (N, halo_up + H_local + halo_dn, W, C); out-of-mesh halos take `fill`
    (default 0 — the conv's zero padding at the true frame boundary;
    max-pooling passes -inf so frame-edge halos behave like the pool's
    excluded padding instead of poisoning the max with zeros).
    """
    parts = [x]
    if halo_up > 0:
        top = _shift_from_lower(x[:, -halo_up:], axis_name)
        if fill:
            idx = jax.lax.axis_index(axis_name)
            top = jnp.where(idx == 0, jnp.full_like(top, fill), top)
        parts.insert(0, top)
    if halo_dn > 0:
        bot = _shift_from_upper(x[:, :halo_dn], axis_name)
        if fill:
            idx = jax.lax.axis_index(axis_name)
            n = jax.lax.psum(1, axis_name)
            bot = jnp.where(idx == n - 1, jnp.full_like(bot, fill), bot)
        parts.append(bot)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _local_conv(x, w, stride, pad_w: Tuple[int, int], preferred=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((0, 0), pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def halo_conv2d_shard(
    x_local,
    w,
    *,
    pads: Tuple[int, int, int, int],
    axis_name: str,
    overlap: bool = True,
):
    """Spatially-sharded stride-1 conv body (call inside shard_map).

    pads = (top, bottom, left, right) of the GLOBAL conv with the
    "same"-geometry constraint pt + pb == k - 1 (every odd- and even-kernel
    same-pad conv satisfies this, conv2d.cpp:69-105). Each shard keeps its
    H_local output rows: windows for row j read exchanged rows
    [j, j + k) of (pt up-halo rows | local rows | k-1-pt down-halo rows);
    edge shards receive zeros from outside the mesh = the global padding.

    overlap=True computes the interior rows (no neighbor data needed)
    from x_local directly — independent of the ppermute, so XLA's
    scheduler runs the collective and the interior conv concurrently —
    and only the thin border strips from the exchanged tensor.
    """
    k = w.shape[0]
    pt, pb, pl_, pr = pads
    assert pt + pb == k - 1, f"halo conv needs same-geometry pads, got {pads}"
    n, h_local, _, _ = x_local.shape
    halo_up, halo_dn = pt, k - 1 - pt
    assert halo_up <= h_local and halo_dn <= h_local, "shard too thin for halo"

    # Interior: output rows [pt, pt + n_int) need only local input rows.
    n_int = h_local - k + 1
    if not overlap or n_int <= 0:
        # No interior to overlap with (shard thinner than the kernel):
        # plain exchange-then-convolve.
        xh = halo_exchange(x_local, halo_up, halo_dn, axis_name)
        return _local_conv(xh, w, 1, (pl_, pr))
    interior = _local_conv(x_local, w, 1, (pl_, pr))  # (N, n_int, ...)

    # Borders: exchange halos and convolve just the two strips.
    top_halo = (
        _shift_from_lower(x_local[:, -halo_up:], axis_name)
        if halo_up
        else x_local[:, :0]
    )
    bot_halo = (
        _shift_from_upper(x_local[:, :halo_dn], axis_name)
        if halo_dn
        else x_local[:, :0]
    )
    parts = []
    if halo_up:
        # output rows [0, pt): need rows [0, pt + k - 1) of (halo|local)
        top_in = jnp.concatenate([top_halo, x_local[:, : k - 1]], axis=1)
        parts.append(_local_conv(top_in, w, 1, (pl_, pr)))
    parts.append(interior)
    if halo_dn:
        # output rows [pt + n_int, h_local): rows from local tail + halo
        bot_in = jnp.concatenate([x_local[:, -(k - 1) :], bot_halo], axis=1)
        parts.append(_local_conv(bot_in, w, 1, (pl_, pr)))
    return jnp.concatenate(parts, axis=1)


def make_halo_conv(
    mesh: Mesh, axis_name: str = "spatial", overlap: bool = True
):
    """Wrap halo_conv2d_shard into a shard_map over the given mesh axis.

    Returns conv(x_global, w, stride, pads) operating on H-sharded NHWC.
    """
    def conv(x, w, pads: Tuple[int, int, int, int]):
        body = functools.partial(
            halo_conv2d_shard,
            pads=tuple(pads), axis_name=axis_name,
            overlap=overlap,
        )
        return jax.shard_map(
            lambda xl, wl: body(xl, wl),
            mesh=mesh,
            in_specs=(P(None, axis_name, None, None), P()),
            out_specs=P(None, axis_name, None, None),
            check_vma=False,
        )(x, w)

    return conv
