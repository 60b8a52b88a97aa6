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
