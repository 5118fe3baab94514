"""HuggingFace safetensors reader (header JSON + raw offsets).

Byte-level parser mirroring ModelLoader/SafetensorsLoader.cs:9-108 — no
external safetensors dependency.
"""

from __future__ import annotations

import json
import struct
from typing import Dict

import numpy as np

_DTYPES = {
    "I8": np.int8, "I16": np.int16, "I32": np.int32, "I64": np.int64,
    "U8": np.uint8, "U16": np.uint16, "U32": np.uint32, "U64": np.uint64,
    "F16": np.float16, "F32": np.float32, "F64": np.float64, "BOOL": np.bool_,
}
try:
    import ml_dtypes

    _DTYPES["BF16"] = ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    pass


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        header_size = struct.unpack("<q", f.read(8))[0]
        if header_size <= 0 or header_size > 100_000_000:
            raise ValueError(f"invalid safetensors header size {header_size}")
        header = json.loads(f.read(header_size).decode("utf-8"))
        body = f.tell()
        out: Dict[str, np.ndarray] = {}
        for name, info in header.items():
            if name == "__metadata__" or "data_offsets" not in info:
                continue
            start, end = info["data_offsets"]
            dtype = np.dtype(_DTYPES[info["dtype"]])
            shape = tuple(info["shape"])
            f.seek(body + start)
            raw = f.read(end - start)
            out[name] = np.frombuffer(raw, dtype=dtype).reshape(shape).copy()
        return out


def save_safetensors(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Minimal writer (row-major, no metadata)."""
    _CODES = {np.dtype(v): k for k, v in _DTYPES.items()}
    header, offset, blobs = {}, 0, []
    for name, arr in state_dict.items():
        arr = np.ascontiguousarray(arr)
        nbytes = arr.nbytes
        header[name] = {"dtype": _CODES[arr.dtype], "shape": list(arr.shape),
                        "data_offsets": [offset, offset + nbytes]}
        blobs.append(arr.tobytes())
        offset += nbytes
    hjson = json.dumps(header).encode("utf-8")
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
