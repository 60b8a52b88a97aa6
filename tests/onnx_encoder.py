"""Minimal ONNX protobuf *encoder* for tests: builds ModelProto bytes by
hand (mirror of shadernn_tpu/tools/onnx_reader.py), so the importer can be
tested without the `onnx` package."""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence

import numpy as np


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _int_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & ((1 << 64) - 1))


def _float_field(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7}[arr.dtype]
    out = b""
    for d in arr.shape:
        out += _int_field(1, d)
    out += _int_field(2, dt)
    out += _len_field(8, name.encode())
    out += _len_field(9, arr.tobytes())
    return out


def attr_ints(name: str, vals: Sequence[int]) -> bytes:
    out = _len_field(1, name.encode())
    for v in vals:
        out += _int_field(8, v)
    return out + _int_field(20, 7)  # type INTS


def attr_int(name: str, v: int) -> bytes:
    return _len_field(1, name.encode()) + _int_field(3, v) + _int_field(20, 2)


def attr_float(name: str, v: float) -> bytes:
    return _len_field(1, name.encode()) + _float_field(2, v) + _int_field(20, 1)


def attr_str(name: str, s: str) -> bytes:
    return _len_field(1, name.encode()) + _len_field(4, s.encode()) + _int_field(20, 3)


def node(op: str, inputs: Sequence[str], outputs: Sequence[str],
         name: str = "", attrs: Sequence[bytes] = ()) -> bytes:
    out = b""
    for i in inputs:
        out += _len_field(1, i.encode())
    for o in outputs:
        out += _len_field(2, o.encode())
    out += _len_field(3, (name or outputs[0]).encode())
    out += _len_field(4, op.encode())
    for a in attrs:
        out += _len_field(5, a)
    return out


def value_info(name: str, shape: Sequence[Optional[int]]) -> bytes:
    dims = b""
    for d in shape:
        dim = _int_field(1, d) if d is not None else _len_field(2, b"d")
        dims += _len_field(1, dim)
    tensor_type = _int_field(1, 1) + _len_field(2, dims)  # elem_type f32
    type_proto = _len_field(1, tensor_type)
    return _len_field(1, name.encode()) + _len_field(2, type_proto)


def model(nodes: List[bytes], initializers: List[bytes],
          inputs: List[bytes], outputs: List[bytes],
          name: str = "test") -> bytes:
    graph = b""
    for n in nodes:
        graph += _len_field(1, n)
    graph += _len_field(2, name.encode())
    for t in initializers:
        graph += _len_field(5, t)
    for i in inputs:
        graph += _len_field(11, i)
    for o in outputs:
        graph += _len_field(12, o)
    return _int_field(1, 7) + _len_field(7, graph)  # ir_version + graph
