"""Native runtime (C++/ctypes) tests vs numpy references.

Requires libsnn_runtime.so (native/build.sh); tests skip when absent so
CI stays green on unbuilt checkouts, but the library is committed-built
in this repo's normal workflow.
"""

import numpy as np
import pytest

from shadernn_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="libsnn_runtime.so not built"
)


@requires_native
def test_repack_oihw_matches_numpy(rng):
    o, i, k = 8, 5, 3
    flat = rng.standard_normal(o * i * k * k).astype(np.float32)
    got = native.repack_oihw_to_hwio(flat, o, i, k, k)
    want = flat.reshape(o, i, k, k).transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


@requires_native
def test_repack_dw_matches_numpy(rng):
    o, k = 6, 5
    flat = rng.standard_normal(o * k * k).astype(np.float32)
    got = native.repack_dw_to_hw1o(flat, o, k, k)
    want = flat.reshape(o, k, k).transpose(1, 2, 0)[:, :, None, :]
    np.testing.assert_array_equal(got, want)


@requires_native
def test_quantize_matches_python(rng):
    from shadernn_tpu.quant.quantize import quantize_weight

    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    qn, sn = native.quantize_int8(w)
    qp, sp = quantize_weight(w, axis=-1)
    np.testing.assert_allclose(sn.reshape(-1), sp.reshape(-1), rtol=1e-6)
    # rounding mode may differ by at most one ulp at exact .5 boundaries
    assert np.abs(qn.astype(int) - qp.astype(int)).max() <= 1


@requires_native
def test_nv12_matches_python(rng):
    from shadernn_tpu.image.color import nv12_to_rgb as np_impl

    h, w = 16, 24
    y = (rng.random((h, w)) * 255).astype(np.uint8)
    uv = (rng.random((h // 2, w // 2, 2)) * 255).astype(np.uint8)
    got = native.nv12_to_rgb(y, uv)
    data = np.concatenate([y.reshape(-1), uv.reshape(-1)])
    want = np_impl(data, h, w)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@requires_native
def test_frame_ring_spsc(rng):
    import threading

    ring = native.NativeFrameRing(capacity=8, slot_bytes=1024)
    frames = [rng.random(100).astype(np.float32) for _ in range(50)]
    received = []

    def consumer():
        while len(received) < len(frames):
            item = ring.pop()
            if item is not None:
                received.append(item.view(np.float32).copy())

    t = threading.Thread(target=consumer)
    t.start()
    for f in frames:
        while not ring.push(f):
            pass
    t.join(timeout=10)
    assert len(received) == len(frames)
    for got, want in zip(received, frames):
        np.testing.assert_array_equal(got[: want.size], want)


@requires_native
def test_ring_full_and_empty():
    ring = native.NativeFrameRing(capacity=2, slot_bytes=16)
    assert ring.pop() is None
    payload = np.arange(4, dtype=np.float32)
    assert ring.push(payload)
    assert ring.push(payload)
    assert not ring.push(payload)  # full (capacity rounded to 2)
    assert len(ring) == 2


@requires_native
def test_write_dump(tmp_path, rng):
    data = rng.standard_normal((4, 5)).astype(np.float32)
    p = str(tmp_path / "d.bin")
    native.write_dump(p, data)
    back = np.fromfile(p, "<f4").reshape(4, 5)
    np.testing.assert_array_equal(back, data)


def test_numpy_fallbacks_exist(rng):
    """Fallback paths must work even without the library."""
    flat = rng.standard_normal(2 * 3 * 9).astype(np.float32)
    out = np.ascontiguousarray(flat.reshape(2, 3, 3, 3).transpose(2, 3, 1, 0))
    assert out.shape == (3, 3, 3, 2)
