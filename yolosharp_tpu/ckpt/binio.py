"""YoloSharp LEB128 `.bin` checkpoint format: byte-compatible reader/writer.

Format (write: Models/YoloBaseTaskModel.cs:470-559, read: Utils/Lib.cs:9-54):
  LEB128 tensor_count, then per tensor:
    C# BinaryWriter string (7-bit-encoded length prefix + UTF-8 name),
    LEB128 dtype (TorchSharp ScalarType enum),
    LEB128 rank, LEB128 dims..., raw little-endian bytes.
"""

from __future__ import annotations

import io
from typing import Dict

import numpy as np

# TorchSharp ScalarType enum -> numpy dtype
_DTYPES = {
    0: np.uint8, 1: np.int8, 2: np.int16, 3: np.int32, 4: np.int64,
    5: np.float16, 6: np.float32, 7: np.float64, 11: np.bool_,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}
_BF16_CODE = 15

try:
    import ml_dtypes

    _DTYPES[_BF16_CODE] = ml_dtypes.bfloat16
    _DTYPE_CODES[np.dtype(ml_dtypes.bfloat16)] = _BF16_CODE
except ImportError:  # pragma: no cover
    pass


def _read_leb128(f) -> int:
    num, shift = 0, 0
    while True:
        b = f.read(1)[0]
        num += (b & 0x7F) << (shift * 7)
        if (b & 0x80) == 0:
            return num
        shift += 1


def _write_leb128(f, value: int) -> None:
    if value < 0:
        raise ValueError("LEB128 negative")
    while True:
        low = value & 0x7F
        value >>= 7
        if value == 0:
            f.write(bytes([low]))
            return
        f.write(bytes([low | 0x80]))


def _read_csharp_string(f) -> str:
    length, shift = 0, 0
    while True:
        b = f.read(1)[0]
        length |= (b & 0x7F) << shift
        if (b & 0x80) == 0:
            break
        shift += 7
    return f.read(length).decode("utf-8")


def _write_csharp_string(f, s: str) -> None:
    data = s.encode("utf-8")
    length = len(data)
    while True:
        low = length & 0x7F
        length >>= 7
        if length == 0:
            f.write(bytes([low]))
            break
        f.write(bytes([low | 0x80]))
    f.write(data)


def load_bin(path: str) -> Dict[str, np.ndarray]:
    """Read a YoloSharp .bin into {name: ndarray} (native dtypes kept).

    Uses the C++ single-pass parser (native/yolosharp_native.cpp) when the
    toolchain is available; byte-identical pure-Python fallback below.
    """
    try:
        from ..native import parse_bin_native

        native = parse_bin_native(path)
        if native is not None:
            return native
    except Exception:
        pass
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        count = _read_leb128(f)
        for _ in range(count):
            name = _read_csharp_string(f)
            dtype_code = _read_leb128(f)
            rank = _read_leb128(f)
            shape = tuple(_read_leb128(f) for _ in range(rank))
            dtype = np.dtype(_DTYPES[dtype_code])
            n = int(np.prod(shape)) if shape else 1
            data = f.read(n * dtype.itemsize)
            out[name] = np.frombuffer(data, dtype=dtype).reshape(shape).copy()
    return out


def save_bin(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Write {name: ndarray} as a YoloSharp-readable .bin."""
    buf = io.BytesIO()
    _write_leb128(buf, len(state_dict))
    for name, arr in state_dict.items():
        # NB: np.ascontiguousarray would promote 0-d scalars to 1-d
        arr = np.asarray(arr, order="C")
        code = _DTYPE_CODES.get(arr.dtype)
        if code is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        _write_csharp_string(buf, name)
        _write_leb128(buf, code)
        _write_leb128(buf, arr.ndim)
        for d in arr.shape:
            _write_leb128(buf, d)
        buf.write(arr.tobytes())
    with open(path, "wb") as f:
        f.write(buf.getvalue())
