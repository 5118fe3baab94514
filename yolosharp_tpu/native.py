"""ctypes bindings for the first-party C++ host library (native/).

Builds native/yolosharp_native.cpp on first import (g++ -O3 -shared) and
caches the .so next to the source. Every entry point has a pure-Python
fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "yolosharp_native.cpp")
_SO = os.path.join(_HERE, "native", "yolosharp_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so:
            lib = ctypes.CDLL(so)
            lib.ys_parse_bin.restype = ctypes.c_int64
            lib.ys_parse_bin.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64]
            lib.ys_nms.restype = ctypes.c_int64
            lib.ys_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_float,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.ys_letterbox_u8.restype = None
            lib.ys_letterbox_u8.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_uint8]
            if hasattr(lib, "ys_s2d_pack_u8"):
                lib.ys_s2d_pack_u8.restype = None
                lib.ys_s2d_pack_u8.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
            _lib = lib
    return _lib


_BIN_DTYPES = {0: np.uint8, 1: np.int8, 2: np.int16, 3: np.int32,
               4: np.int64, 5: np.float16, 6: np.float32, 7: np.float64,
               11: np.bool_}


def parse_bin_native(path: str):
    """Fast .bin parse via C++; returns {name: ndarray} or None."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.fromfile(path, dtype=np.uint8)
    max_tensors = 8192
    index = np.zeros(max_tensors * 13, np.int64)
    names = ctypes.create_string_buffer(max_tensors * 128)
    count = lib.ys_parse_bin(
        data.ctypes.data_as(ctypes.c_char_p), data.size,
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), index.size,
        names, len(names))
    if count < 0:
        return None
    out = {}
    raw_names = bytes(names.raw)
    for i in range(count):
        row = index[i * 13:(i + 1) * 13]
        name_off = int(row[0])
        name = raw_names[name_off:raw_names.index(b"\0", name_off)].decode()
        dtype = np.dtype(_BIN_DTYPES.get(int(row[1]), np.float32))
        rank = int(row[2])
        dims = tuple(int(d) for d in row[3:3 + rank])
        off, nbytes = int(row[11]), int(row[12])
        arr = np.frombuffer(data, dtype=dtype, count=nbytes // dtype.itemsize,
                            offset=off).reshape(dims).copy()
        out[name] = arr
    return out


def nms_native(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float,
               max_det: int = 300) -> Optional[np.ndarray]:
    """Exact greedy NMS on host; returns kept indices or None."""
    lib = get_lib()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(min(len(boxes), max_det), np.int64)
    n = lib.ys_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(boxes), iou_thresh,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_det)
    return keep[:n]


def s2d_pack_u8(src: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """2x2 space-to-depth pack of a uint8 image batch: (B, H, W, 3) ->
    (B, H/2, W/2, 12), channel = (py*2+px)*3 + c (nn/common.py
    space_to_depth2 semantics). C++ threaded when available (the numpy
    transpose costs ~80 ms for a 640px batch-32 on a small host; the
    native pack is a fraction of that), numpy fallback otherwise."""
    src = np.ascontiguousarray(src, np.uint8)
    b, h, w, c = src.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, src.shape
    lib = get_lib()
    if lib is not None and hasattr(lib, "ys_s2d_pack_u8"):
        dst = np.empty((b, h // 2, w // 2, 12), np.uint8)
        lib.ys_s2d_pack_u8(
            src.ctypes.data_as(ctypes.c_char_p),
            dst.ctypes.data_as(ctypes.c_char_p), b, h, w, n_threads)
        return dst
    y = src.reshape(b, h // 2, 2, w // 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(y.reshape(b, h // 2, w // 2, 12))


def letterbox_native(src: np.ndarray, dh: int, dw: int, new_h: int,
                     new_w: int, pad_top: int, pad_left: int,
                     fill: int = 114) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    dst = np.zeros((dh, dw, 3), np.uint8)
    lib.ys_letterbox_u8(
        src.ctypes.data_as(ctypes.c_char_p), src.shape[0], src.shape[1],
        dst.ctypes.data_as(ctypes.c_char_p), dh, dw, new_h, new_w,
        pad_top, pad_left, fill)
    return dst
