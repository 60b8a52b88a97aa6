"""ctypes bindings to the native runtime (native/snn_runtime.cpp).

Every entry point has a numpy fallback so the engine works without the
compiled library; when libsnn_runtime.so is present (native/build.sh), the
host-side hot paths — artifact weight repack, int8 quantization, NV12
conversion, the SPSC frame ring — run in C++ like the reference's runtime
does (SURVEY.md §2: C++ components get native equivalents, not Python
stand-ins).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.native")

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(__file__)
    for cand in (
        os.path.join(here, "lib", "libsnn_runtime.so"),
        os.path.join(here, "..", "native", "build", "libsnn_runtime.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if not path:
        logger.info("libsnn_runtime.so not found; using numpy fallbacks "
                    "(build with native/build.sh)")
        return None
    lib = ctypes.CDLL(path)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_i8p = ctypes.POINTER(ctypes.c_int8)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.snn_repack_oihw_to_hwio.argtypes = [c_f32p, c_f32p] + [ctypes.c_int] * 4
    lib.snn_repack_oihw_to_hwio.restype = ctypes.c_int
    lib.snn_repack_dw_to_hw1o.argtypes = [c_f32p, c_f32p] + [ctypes.c_int] * 3
    lib.snn_repack_dw_to_hw1o.restype = ctypes.c_int
    lib.snn_quantize_int8.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int64,
                                      c_i8p, c_f32p]
    lib.snn_quantize_int8.restype = ctypes.c_int
    lib.snn_nv12_to_rgb.argtypes = [c_u8p, c_u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, c_u8p]
    lib.snn_nv12_to_rgb.restype = ctypes.c_int
    lib.snn_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.snn_ring_create.restype = ctypes.c_void_p
    lib.snn_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.snn_ring_push.argtypes = [ctypes.c_void_p, c_u8p, ctypes.c_int64]
    lib.snn_ring_push.restype = ctypes.c_int
    lib.snn_ring_pop.argtypes = [ctypes.c_void_p, c_u8p]
    lib.snn_ring_pop.restype = ctypes.c_int64
    lib.snn_ring_size.argtypes = [ctypes.c_void_p]
    lib.snn_ring_size.restype = ctypes.c_int64
    lib.snn_write_dump.argtypes = [ctypes.c_char_p, c_f32p, ctypes.c_int64]
    lib.snn_write_dump.restype = ctypes.c_int
    lib.snn_version.restype = ctypes.c_int
    logger.info("native runtime loaded: %s (version %d)", path, lib.snn_version())
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def _fp(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# ---------------------------------------------------------------------------
def repack_oihw_to_hwio(flat: np.ndarray, o: int, i: int, kh: int, kw: int) -> np.ndarray:
    """OIHW float32 stream -> HWIO array (the artifact bin layout)."""
    lib = get_lib()
    flat = np.ascontiguousarray(flat, np.float32)
    if lib is not None:
        out = np.empty((kh, kw, i, o), np.float32)
        rc = lib.snn_repack_oihw_to_hwio(
            _fp(flat, ctypes.c_float), _fp(out, ctypes.c_float), o, i, kh, kw
        )
        assert rc == 0
        return out
    return np.ascontiguousarray(flat.reshape(o, i, kh, kw).transpose(2, 3, 1, 0))


def repack_dw_to_hw1o(flat: np.ndarray, o: int, kh: int, kw: int) -> np.ndarray:
    lib = get_lib()
    flat = np.ascontiguousarray(flat, np.float32)
    if lib is not None:
        out = np.empty((kh, kw, 1, o), np.float32)
        rc = lib.snn_repack_dw_to_hw1o(
            _fp(flat, ctypes.c_float), _fp(out, ctypes.c_float), o, kh, kw
        )
        assert rc == 0
        return out
    return np.ascontiguousarray(
        flat.reshape(o, kh, kw).transpose(1, 2, 0)[:, :, None, :]
    )


def quantize_int8(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-trailing-channel int8; matches quant/quantize.py."""
    lib = get_lib()
    w2 = np.ascontiguousarray(w, np.float32).reshape(-1, w.shape[-1])
    if lib is not None:
        q = np.empty_like(w2, np.int8)
        scale = np.empty((w2.shape[1],), np.float32)
        rc = lib.snn_quantize_int8(
            _fp(w2, ctypes.c_float), w2.shape[0], w2.shape[1],
            _fp(q, ctypes.c_int8), _fp(scale, ctypes.c_float),
        )
        assert rc == 0
        shape = [1] * (w.ndim - 1) + [w.shape[-1]]
        return q.reshape(w.shape), scale.reshape(shape)
    from shadernn_tpu.quant.quantize import quantize_weight

    return quantize_weight(np.asarray(w), axis=-1)


def nv12_to_rgb(y_plane: np.ndarray, uv_plane: np.ndarray, nv21: bool = False) -> np.ndarray:
    lib = get_lib()
    h, w = y_plane.shape
    if lib is not None:
        y_c = np.ascontiguousarray(y_plane, np.uint8)
        uv_c = np.ascontiguousarray(uv_plane, np.uint8)
        out = np.empty((h, w, 3), np.uint8)
        rc = lib.snn_nv12_to_rgb(
            _fp(y_c, ctypes.c_uint8), _fp(uv_c, ctypes.c_uint8),
            h, w, int(nv21), _fp(out, ctypes.c_uint8),
        )
        assert rc == 0
        return out
    from shadernn_tpu.image.color import nv12_to_rgb as np_impl

    data = np.concatenate([y_plane.reshape(-1), uv_plane.reshape(-1)])
    return np_impl(data, h, w, nv21=nv21)


class NativeFrameRing:
    """SPSC ring over the C++ implementation (falls back to a deque)."""

    def __init__(self, capacity: int, slot_bytes: int):
        self._lib = get_lib()
        self.slot_bytes = slot_bytes
        if self._lib is not None:
            self._h = self._lib.snn_ring_create(capacity, slot_bytes)
            assert self._h
        else:
            import collections

            self._dq = collections.deque(maxlen=capacity)
            self._cap = capacity

    def push(self, payload: np.ndarray) -> bool:
        buf = np.ascontiguousarray(payload).view(np.uint8).reshape(-1)
        assert buf.nbytes <= self.slot_bytes
        if self._lib is not None:
            return bool(self._lib.snn_ring_push(self._h, _fp(buf, ctypes.c_uint8), buf.nbytes))
        if len(self._dq) >= self._cap:
            return False
        self._dq.append(buf.copy())
        return True

    def pop(self) -> Optional[np.ndarray]:
        if self._lib is not None:
            out = np.empty(self.slot_bytes, np.uint8)
            size = self._lib.snn_ring_pop(self._h, _fp(out, ctypes.c_uint8))
            if size == 0:
                return None
            return out[:size]
        if not self._dq:
            return None
        return self._dq.popleft()

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.snn_ring_size(self._h))
        return len(self._dq)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.snn_ring_destroy(self._h)
            self._h = None


def write_dump(path: str, data: np.ndarray) -> None:
    lib = get_lib()
    flat = np.ascontiguousarray(data, np.float32).reshape(-1)
    if lib is not None:
        rc = lib.snn_write_dump(path.encode(), _fp(flat, ctypes.c_float), flat.size)
        assert rc == 0
        return
    flat.astype("<f4").tofile(path)
