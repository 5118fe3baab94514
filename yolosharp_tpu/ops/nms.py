"""Static-shape, on-device non-maximum suppression.

Functional parity target: YoloSharp/Utils/Ops.cs:239-401 (non_max_suppression,
nms_rotated). The reference uses dynamic-size torchvision.ops.nms on GPU; on
TPU everything is fixed-shape: candidates are pre-selected with lax.top_k,
suppression runs over a padded (K, K) IoU matrix, and results come back as a
fixed (max_det, ...) block with a validity mask — one bulk device->host
transfer instead of the reference's scalar-by-scalar reads
(Models/Detector.cs:50-69).

Two suppression modes:
 - greedy: exact torchvision-NMS semantics via a K-step lax.fori_loop.
 - fast:   YOLACT-style single-shot triangular suppression. For rotated boxes
   this IS the reference algorithm (nms_rotated use_triu, Ops.cs:373-401).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy
from .iou import batch_probiou, box_iou


class NMSOutput(NamedTuple):
    """Fixed-shape NMS result; rows beyond `valid` are zero-padding."""

    boxes: jnp.ndarray    # (B, max_det, 4) xyxy  (or 5 xywhr when rotated)
    scores: jnp.ndarray   # (B, max_det)
    classes: jnp.ndarray  # (B, max_det) int32
    extras: jnp.ndarray   # (B, max_det, E) mask coeffs / angle / kpts
    valid: jnp.ndarray    # (B, max_det) bool


def _greedy_suppress(iou: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Exact sequential greedy NMS on a score-sorted (K, K) IoU matrix.

    Returns keep mask (K,). Row i suppresses j>i iff iou[i, j] > thresh and
    row i itself was kept.
    """
    k = iou.shape[0]
    over = (iou > thresh) & ~jnp.eye(k, dtype=bool)

    def body(i, suppressed):
        kept_i = ~suppressed[i]
        return suppressed | (over[i] & kept_i)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))
    return ~suppressed


def _fast_suppress(iou: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """YOLACT fast-NMS: keep i iff no higher-scored j has iou > thresh."""
    k = iou.shape[0]
    upper = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)
    return ~jnp.any((iou > thresh) & upper, axis=0)


@partial(jax.jit, static_argnames=(
    "max_det", "nc", "pre_topk", "agnostic", "rotated", "mode", "max_wh"))
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    *,
    max_det: int = 300,
    nc: int = 0,
    pre_topk: int = 1024,
    agnostic: bool = False,
    rotated: bool = False,
    mode: str = "greedy",
    max_wh: float = 7680.0,
) -> NMSOutput:
    """Batched fixed-shape NMS.

    Args:
      prediction: (B, 4+nc+E, A) raw head output — xywh boxes, class scores
        (already sigmoided), extras (mask coeffs / kpts; angle last when
        rotated). Channel-first to match the head contract.
      nc: number of classes (0 -> infer as C-4, no extras).
    Returns NMSOutput with static shapes.
    """
    bs, ch, _na = prediction.shape
    nc = nc or ch - 4
    extra = ch - nc - 4

    pred = jnp.swapaxes(prediction, -1, -2)  # (B, A, C)
    boxes_xywh = pred[..., :4]
    cls_scores = pred[..., 4:4 + nc]
    extras = pred[..., 4 + nc:]

    conf = cls_scores.max(-1)
    cls_id = cls_scores.argmax(-1).astype(jnp.int32)
    conf = jnp.where(conf > conf_thres, conf, 0.0)

    k = min(pre_topk, conf.shape[-1])
    top_conf, top_idx = jax.lax.top_k(conf, k)  # (B, K)

    def per_image(conf_k, idx, boxes_a, cls_a, extras_a):
        box = jnp.take_along_axis(boxes_a, idx[:, None], axis=0)
        cls = jnp.take(cls_a, idx)
        ext = jnp.take_along_axis(extras_a, idx[:, None], axis=0)
        valid = conf_k > 0.0

        offset = jnp.where(agnostic, 0.0, cls.astype(box.dtype) * max_wh)
        if rotated:
            # extras' last channel is the angle; box stays xywh + r.
            angle = ext[..., -1:]
            rbox = jnp.concatenate([box[..., :2] + offset[:, None],
                                    box[..., 2:4], angle], axis=-1)
            iou = batch_probiou(rbox, rbox)
            out_box = jnp.concatenate([box, angle], axis=-1)
        else:
            xyxy = xywh2xyxy(box)
            iou = box_iou(xyxy + offset[:, None] * jnp.ones((1, 4), box.dtype),
                          xyxy + offset[:, None] * jnp.ones((1, 4), box.dtype))
            out_box = xyxy

        # padding rows must never suppress: zero their IoU rows/cols
        vmat = valid[:, None] & valid[None, :]
        iou = jnp.where(vmat, iou, 0.0)
        if mode == "fast" or rotated:
            keep = _fast_suppress(iou, iou_thres) & valid
        else:
            keep = _greedy_suppress(iou, iou_thres) & valid

        # compact kept rows to the front, cap at max_det
        keep_scores = jnp.where(keep, conf_k, -1.0)
        k_out = min(max_det, keep_scores.shape[-1])
        sel_scores, sel = jax.lax.top_k(keep_scores, k_out)
        if k_out < max_det:  # fewer anchors than max_det: pad the output
            pad = max_det - k_out
            sel_scores = jnp.pad(sel_scores, (0, pad), constant_values=-1.0)
            sel = jnp.pad(sel, (0, pad))
        ok = sel_scores > 0.0
        z = jnp.where(ok, 1.0, 0.0)
        return (jnp.take_along_axis(out_box, sel[:, None], 0) * z[:, None],
                sel_scores * z,
                jnp.take(cls, sel) * ok.astype(jnp.int32),
                jnp.take_along_axis(ext, sel[:, None], 0) * z[:, None],
                ok)

    out = jax.vmap(per_image)(top_conf, top_idx, boxes_xywh, cls_id, extras)
    return NMSOutput(*out)


def nms_rotated(boxes: jnp.ndarray, scores: jnp.ndarray,
                threshold: float = 0.45) -> jnp.ndarray:
    """Standalone rotated NMS keep-mask over xywhr boxes (N, 5).

    Matches Ops.cs:373-401 (use_triu path): sort by score desc, probiou
    triangular suppression. Returns a boolean keep mask aligned with the
    *input* order.
    """
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = batch_probiou(b, b)
    keep_sorted = _fast_suppress(iou, threshold)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return keep_sorted[inv]
