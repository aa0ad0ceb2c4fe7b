"""Tiny ONNX protobuf *encoder* for tests: build models programmatically so
the executor's op coverage can be validated without the `onnx` package."""
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

DTYPE_CODES = {np.dtype("float32"): 1, np.dtype("uint8"): 2,
               np.dtype("int8"): 3, np.dtype("int32"): 6,
               np.dtype("int64"): 7, np.dtype("bool"): 9,
               np.dtype("float64"): 11}


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _tag(f: int, w: int) -> bytes:
    return _varint((f << 3) | w)


def _ld(f: int, payload: bytes) -> bytes:
    return _tag(f, 2) + _varint(len(payload)) + payload


def _vi(f: int, v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    return _tag(f, 0) + _varint(v)


def _f32(f: int, v: float) -> bytes:
    import struct
    return _tag(f, 5) + struct.pack("<f", v)


def tensor_bytes(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    t = b""
    for d in arr.shape:
        t += _vi(1, d)
    t += _vi(2, DTYPE_CODES[arr.dtype])
    t += _ld(8, name.encode())
    t += _ld(9, arr.tobytes())
    return t


def attr_bytes(name: str, value: Any) -> bytes:
    a = _ld(1, name.encode())
    if isinstance(value, bool):
        a += _vi(3, int(value)) + _vi(20, 2)
    elif isinstance(value, int):
        a += _vi(3, value) + _vi(20, 2)
    elif isinstance(value, float):
        a += _f32(2, value) + _vi(20, 1)
    elif isinstance(value, str):
        a += _ld(4, value.encode()) + _vi(20, 3)
    elif isinstance(value, np.ndarray):
        a += _ld(5, tensor_bytes("", value)) + _vi(20, 4)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            for v in value:
                a += _vi(8, v)
            a += _vi(20, 7)
        else:
            for v in value:
                a += _f32(7, float(v))
            a += _vi(20, 6)
    else:
        raise TypeError(type(value))
    return a


def node_bytes(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
               attrs: Optional[Dict[str, Any]] = None) -> bytes:
    n = b""
    for i in inputs:
        n += _ld(1, i.encode())
    for o in outputs:
        n += _ld(2, o.encode())
    n += _ld(4, op_type.encode())
    for k, v in (attrs or {}).items():
        n += _ld(5, attr_bytes(k, v))
    return n


def build_model(nodes: List[bytes], inputs: Sequence[str],
                outputs: Sequence[str],
                initializers: Optional[Dict[str, np.ndarray]] = None,
                opset: int = 11) -> bytes:
    g = b""
    for n in nodes:
        g += _ld(1, n)
    g += _ld(2, b"g")
    for name, arr in (initializers or {}).items():
        g += _ld(5, tensor_bytes(name, arr))
    for i in inputs:
        g += _ld(11, _ld(1, i.encode()))
    for o in outputs:
        g += _ld(12, _ld(1, o.encode()))
    return _vi(1, 6) + _ld(7, g) + _ld(8, _ld(1, b"") + _vi(2, opset))
