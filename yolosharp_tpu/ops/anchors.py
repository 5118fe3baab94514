"""Anchor grid + distance<->box transforms (DFL geometry).

Functional parity targets: YoloSharp/Utils/Tal.cs:313-453 (make_anchors,
dist2bbox, bbox2dist, dist2rbox, rbox2dist) — shape-static versions: anchors
depend only on feature-map shapes, so they are compile-time constants under
jit (no recompute guard needed, unlike the reference's shape-cache,
Head.cs:210-223).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_anchors(feat_shapes: Sequence[Tuple[int, int]],
                 strides: Sequence[int],
                 grid_cell_offset: float = 0.5,
                 dtype=jnp.float32):
    """Anchor centers + per-anchor stride for a list of (H, W) feature maps.

    Returns (anchor_points (A, 2) in grid units, stride_tensor (A, 1)).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        syy, sxx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([sxx, syy], -1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray,
              xywh: bool = True, axis: int = -1) -> jnp.ndarray:
    """ltrb distances -> boxes around anchor points (xywh or xyxy)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray,
              reg_max: float | None = None) -> jnp.ndarray:
    """xyxy boxes -> ltrb distances from anchor points, clamped to reg_max."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], -1)
    if reg_max is not None:
        dist = jnp.clip(dist, 0, reg_max - 0.01)
    return dist


def dist2rbox(pred_dist: jnp.ndarray, pred_angle: jnp.ndarray,
              anchor_points: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Rotated ltrb distances + angle -> (cx, cy, w, h) rotated box centers."""
    lt, rb = jnp.split(pred_dist, 2, axis=axis)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=axis)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=axis)


def rbox2dist(target_bboxes: jnp.ndarray, anchor_points: jnp.ndarray,
              target_angle: jnp.ndarray, axis: int = -1,
              reg_max: float | None = None) -> jnp.ndarray:
    """Inverse of dist2rbox: rotated xywh + angle -> ltrb distances."""
    xy, wh = jnp.split(target_bboxes, 2, axis=axis)
    offset = xy - anchor_points
    ox, oy = jnp.split(offset, 2, axis=axis)
    cos, sin = jnp.cos(target_angle), jnp.sin(target_angle)
    xf = ox * cos + oy * sin
    yf = -ox * sin + oy * cos
    w, h = jnp.split(wh, 2, axis=axis)
    dist = jnp.concatenate([w / 2 - xf, h / 2 - yf, w / 2 + xf, h / 2 + yf],
                           axis=axis)
    if reg_max is not None:
        dist = jnp.clip(dist, 0, reg_max - 0.01)
    return dist


def dfl_decode(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """DFL integral decode: (..., 4*reg_max) logits -> (..., 4) distances.

    Equivalent to the reference's fixed-arange 1x1 conv over a softmax
    (Block.cs DFL, Modules/Block.cs:15-46) but expressed as a softmax
    expectation, which XLA fuses into one kernel.
    """
    shape = pred_dist.shape[:-1]
    x = pred_dist.reshape(*shape, 4, reg_max)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return (jax.nn.softmax(x.astype(jnp.float32), axis=-1) * proj).sum(-1)
