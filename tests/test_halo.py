"""Explicit halo-exchange conv tests on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import oracle
from shadernn_tpu.ops.common import padding_offsets
from shadernn_tpu.parallel.halo import make_halo_conv

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("spatial",))


@pytest.mark.parametrize("k", [3, 5, 9, 4])
@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("n_shards", [4, 8])
def test_halo_conv_matches_oracle(rng, fp32_threshold, k, overlap, n_shards):
    h, w, cin, cout = 32, 24, 6, 8
    x = rng.standard_normal((2, h, w, cin), dtype=np.float32)
    wt = rng.standard_normal((k, k, cin, cout), dtype=np.float32) * 0.2
    pads = padding_offsets("same", k)

    mesh = _mesh(n_shards)
    conv = make_halo_conv(mesh, "spatial", overlap=overlap)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "spatial", None, None))
    )
    got = np.asarray(jax.jit(lambda a, b: conv(a, b, pads))(xs, jnp.asarray(wt)))

    want = oracle.conv2d(x, wt, None, stride=1, pads=pads)
    oracle.compare(got, want, fp32_threshold, f"halo-conv k{k} n{n_shards} ov={overlap}")


def test_halo_conv_chain(rng, fp32_threshold):
    """Two chained halo convs (the real use: multi-layer sharded model)."""
    h, w, c = 64, 16, 4
    x = rng.standard_normal((1, h, w, c), dtype=np.float32)
    w1 = rng.standard_normal((3, 3, c, 8), dtype=np.float32) * 0.3
    w2 = rng.standard_normal((5, 5, 8, 4), dtype=np.float32) * 0.3
    p1, p2 = padding_offsets("same", 3), padding_offsets("same", 5)

    mesh = _mesh(8)
    conv = make_halo_conv(mesh, "spatial")
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "spatial", None, None))
    )

    @jax.jit
    def two(a, wa, wb):
        y = jnp.maximum(conv(a, wa, p1), 0)
        return conv(y, wb, p2)

    got = np.asarray(two(xs, jnp.asarray(w1), jnp.asarray(w2)))
    want = oracle.conv2d(
        np.maximum(oracle.conv2d(x, w1, None, 1, p1), 0), w2, None, 1, p2
    )
    oracle.compare(got, want, fp32_threshold, "halo-chain")


def test_halo_exchange_edge_zeros(rng):
    """Edge shards must see zero halos (global zero padding)."""
    from shadernn_tpu.parallel.halo import halo_exchange

    mesh = _mesh(4)
    x = rng.standard_normal((1, 8, 4, 2), dtype=np.float32)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, "spatial", None, None))
    )
    f = jax.shard_map(
        lambda a: halo_exchange(a, 1, 1, "spatial"),
        mesh=mesh,
        in_specs=P(None, "spatial", None, None),
        out_specs=P(None, "spatial", None, None),
        check_vma=False,
    )
    y = np.asarray(f(xs))  # (1, 4*(2+2), 4, 2)
    shard0 = y[:, 0:4]
    assert np.all(shard0[:, 0] == 0)  # top halo of first shard is zero
    np.testing.assert_array_equal(shard0[:, 1:3], x[:, 0:2])
    last = y[:, -4:]
    assert np.all(last[:, -1] == 0)  # bottom halo of last shard is zero
