"""Box-format conversions and clipping, as pure jittable jnp functions.

Functional parity targets: YoloSharp/Utils/Ops.cs:13-218 (xywhr2xyxyxyxy,
xywh2xyxy, xyxy2xywh, xyxy2xywhn, xywhn2xyxy, clip_boxes, clip_keypoints,
clip_obb_corners, sort_obb_corners) — re-derived here in vectorized,
stacked-channel form (no per-channel writes; XLA fuses the whole conversion
into one elementwise kernel).
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2) on the last axis."""
    cxy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([cxy - half, cxy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h) on the last axis."""
    p1, p2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(p1 + p2) * 0.5, p2 - p1], axis=-1)


def xyxy2xywhn(x: jnp.ndarray, w: float = 640, h: float = 640,
               clip: bool = False, eps: float = 0.0) -> jnp.ndarray:
    """xyxy -> normalized xywh (divide by image width/height)."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    y = xyxy2xywh(x)
    scale = jnp.asarray([w, h, w, h], dtype=y.dtype)
    return y / scale


def xywhn2xyxy(x: jnp.ndarray, w: float = 640, h: float = 640,
               padw: float = 0, padh: float = 0) -> jnp.ndarray:
    """Normalized xywh -> absolute xyxy with optional pad offset."""
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=x.dtype)
    return xywh2xyxy(x * scale) + pad


def clip_boxes(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip xyxy boxes to image (height, width)."""
    h, w = shape[0], shape[1]
    hi = jnp.asarray([w, h, w, h], dtype=x.dtype)
    return jnp.clip(x, 0.0, hi)


def clip_keypoints(kpts: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip keypoints (..., 2|3) to (height, width); zero out-of-image vis."""
    h, w = shape[0], shape[1]
    xy = kpts[..., :2]
    if kpts.shape[-1] == 3:
        oob = ((xy[..., 0] < 0) | (xy[..., 0] > w)
               | (xy[..., 1] < 0) | (xy[..., 1] > h))
        vis = jnp.where(oob, 0.0, kpts[..., 2])
        xy = jnp.stack([jnp.clip(xy[..., 0], 0, w), jnp.clip(xy[..., 1], 0, h)], -1)
        return jnp.concatenate([xy, vis[..., None]], axis=-1)
    return jnp.stack([jnp.clip(xy[..., 0], 0, w), jnp.clip(xy[..., 1], 0, h)], -1)


def clip_obb_corners(corners: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip OBB corner points (..., 2) to (height, width)."""
    h, w = shape[0], shape[1]
    return jnp.stack(
        [jnp.clip(corners[..., 0], 0, w), jnp.clip(corners[..., 1], 0, h)], -1)


def xywhr2xyxyxyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h, r) -> 4 corner points (..., 4, 2).

    Corner order matches the reference (Ops.cs:13-37):
    ctr+v1+v2, ctr+v1-v2, ctr-v1-v2, ctr-v1+v2 with
    v1=(w/2 cos, w/2 sin), v2=(-h/2 sin, h/2 cos).
    """
    ctr = x[..., 0:2]
    w, h, r = x[..., 2:3], x[..., 3:4], x[..., 4:5]
    cos, sin = jnp.cos(r), jnp.sin(r)
    v1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], axis=-1)
    v2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], axis=-1)
    return jnp.stack([ctr + v1 + v2, ctr + v1 - v2,
                      ctr - v1 - v2, ctr - v1 + v2], axis=-2)


def xyxyxyxy2xywhr(corners) -> jnp.ndarray:
    """4 corner points (N, 4, 2) -> (cx, cy, w, h, r) via OpenCV minAreaRect.

    Host-side label preprocessing only (the reference also calls into
    OpenCV here, Ops.cs:44-61); never used inside jit.
    """
    import math

    import cv2
    import numpy as np

    pts = np.asarray(corners, dtype=np.float32).reshape(-1, 4, 2)
    out = np.zeros((pts.shape[0], 5), dtype=np.float32)
    for i, p in enumerate(pts):
        (cx, cy), (bw, bh), ang = cv2.minAreaRect(p)
        out[i] = (cx, cy, bw, bh, ang * math.pi / 180.0)
    return out.reshape(np.asarray(corners).shape[:-2] + (5,))


def sort_obb_corners(corners: jnp.ndarray) -> jnp.ndarray:
    """Sort OBB corner points counter-clockwise by angle around the center
    (Ops.cs:204-218). corners: (n, 4, 2)."""
    centers = corners.mean(axis=-2, keepdims=True)
    d = corners - centers
    angles = jnp.arctan2(d[..., 1], d[..., 0])
    order = jnp.argsort(angles, axis=-1)
    return jnp.take_along_axis(corners, order[..., None], axis=-2)


def cxcywhr2xyxyxyxy(x):
    """Scalar-form corner expansion used by demo drawing (Ops.cs:491-513)."""
    import numpy as np

    cx, cy, w, h, r = x
    c, s = np.cos(r), np.sin(r)
    wh, hh = w / 2, h / 2
    return np.array([
        cx - wh * c + hh * s, cy - wh * s - hh * c,
        cx + wh * c + hh * s, cy + wh * s - hh * c,
        cx + wh * c - hh * s, cy + wh * s + hh * c,
        cx - wh * c - hh * s, cy - wh * s + hh * c,
    ], dtype=np.float32)
