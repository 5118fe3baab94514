"""Tests for the first-party C++ host library (LEB128 codec, greedy NMS,
letterbox) against the pure-Python implementations."""

import os

import numpy as np
import pytest

from yolosharp_tpu.native import (get_lib, letterbox_native, nms_native,
                                  parse_bin_native)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")

REF_BIN = "/root/reference/YoloSharpDemo/Assets/PreTrainedModels/Yolov5n.bin"


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="no reference bin")
def test_native_bin_parse_matches_python():
    from yolosharp_tpu.ckpt.binio import load_bin

    native = parse_bin_native(REF_BIN)
    assert native is not None and len(native) == 348
    # force pure-python path for comparison
    import yolosharp_tpu.ckpt.binio as binio

    out = {}
    with open(REF_BIN, "rb") as f:
        count = binio._read_leb128(f)
        for _ in range(count):
            name = binio._read_csharp_string(f)
            dtype_code = binio._read_leb128(f)
            rank = binio._read_leb128(f)
            shape = tuple(binio._read_leb128(f) for _ in range(rank))
            dtype = np.dtype(binio._DTYPES[dtype_code])
            n = int(np.prod(shape)) if shape else 1
            out[name] = np.frombuffer(f.read(n * dtype.itemsize),
                                      dtype=dtype).reshape(shape)
    assert set(native) == set(out)
    for k in out:
        np.testing.assert_array_equal(native[k], out[k])


def test_native_nms_matches_numpy():
    rng = np.random.default_rng(0)
    n = 500
    xy = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 90, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    keep = nms_native(boxes, scores, 0.5)

    def np_iou(a, b):
        tl = np.maximum(a[:2], b[:, :2])
        br = np.minimum(a[2:], b[:, 2:])
        inter = np.clip(br - tl, 0, None).prod(-1)
        aa = (a[2:] - a[:2]).prod()
        ab = (b[:, 2:] - b[:, :2]).prod(-1)
        return inter / (aa + ab - inter + 1e-7)

    order = np.argsort(-scores)
    suppressed = np.zeros(n, bool)
    want = []
    for i in order:
        if suppressed[i]:
            continue
        want.append(i)
        suppressed |= np_iou(boxes[i], boxes) > 0.5
        suppressed[i] = True
    np.testing.assert_array_equal(keep, want[:300])


def test_native_letterbox_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    src = rng.integers(0, 255, (97, 133, 3), np.uint8)
    new_h, new_w = 47, 64
    pt, pl = 8, 3
    got = letterbox_native(src, 64, 72, new_h, new_w, pt, pl)
    want = np.full((64, 72, 3), 114, np.uint8)
    want[pt:pt + new_h, pl:pl + new_w] = cv2.resize(
        src, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    # bilinear rounding may differ by 1 ulp on a few pixels
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 1).mean() > 0.995
    assert diff.max() <= 4
