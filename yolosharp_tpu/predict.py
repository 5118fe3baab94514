"""Head-output decoding: DFL + anchors + sigmoid -> "inference" tensors,
plus the End2End top-k postprocess. Pure jnp, composed with the network into
one jitted graph.

Functional parity targets: Head.Detect._inference/_get_decode_boxes/
postprocess/get_topk_index (Modules/Head.cs:107-223), Segment/Obb/Pose
overrides (Head.cs:309-330, 410-452, 526-563).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .loss.losses import flatten_levels
from .ops.anchors import dfl_decode, dist2bbox, dist2rbox, make_anchors

STRIDES = (8, 16, 32)


def _decode_boxes(branch: Dict, reg_max: int, end2end: bool):
    """-> (dbox (B, A, 4) image units, anchors (A, 2), strides (A, 1))."""
    feat_shapes = [m.shape[1:3] for m in branch["box"]]
    anchors, strides = make_anchors(feat_shapes, STRIDES)
    dist = dfl_decode(flatten_levels(branch["box"]), reg_max)  # (B, A, 4)
    if "angle" in branch:
        angle = flatten_levels(branch["angle"]).astype(jnp.float32)
        dbox = dist2rbox(dist, angle, anchors) * strides
    else:
        dbox = dist2bbox(dist, anchors, xywh=not end2end) * strides
    return dbox, anchors, strides


def decode_inference(branch: Dict, *, nc: int, reg_max: int = 16,
                     end2end: bool = False, kpt_num: int = 17,
                     kpt_dim: int = 3) -> jnp.ndarray:
    """Raw head maps -> (B, C, A) inference tensor (channel-first, matching
    the reference NMS input contract):
      detect:  C = 4 + nc                      (xywh, or xyxy when e2e)
      segment: C = 4 + nc + nm
      obb:     C = 4 + nc + 1                  (xywh rotated-center + angle)
      pose:    C = 4 + nc + kpt_num*kpt_dim    (decoded keypoints)
    """
    dbox, anchors, strides = _decode_boxes(branch, reg_max, end2end)
    scores = jax.nn.sigmoid(flatten_levels(branch["cls"]).astype(jnp.float32))
    parts = [dbox, scores]
    if "mask" in branch:
        parts.append(flatten_levels(branch["mask"]).astype(jnp.float32))
    if "kpt" in branch:
        kpts = flatten_levels(branch["kpt"]).astype(jnp.float32)
        b, a, _ = kpts.shape
        kpts = kpts.reshape(b, a, kpt_num, kpt_dim)
        xy = (kpts[..., :2] * 2.0 + (anchors[None, :, None] - 0.5)) \
            * strides[None, :, None]
        if kpt_dim == 3:
            vis = jax.nn.sigmoid(kpts[..., 2:3])
            kpts = jnp.concatenate([xy, vis], -1)
        else:
            kpts = xy
        parts.append(kpts.reshape(b, a, kpt_num * kpt_dim))
    if "angle" in branch:
        parts.append(flatten_levels(branch["angle"]).astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1).swapaxes(-1, -2)  # (B, C, A)


def decode_inference_topk(branch: Dict, *, nc: int, conf_thres,
                          k: int, reg_max: int = 16, kpt_num: int = 17,
                          kpt_dim: int = 3):
    """Select-then-decode: top-k candidate pre-selection on RAW class
    logits, then DFL/anchor/keypoint decode for only the K selected
    anchors.

    Exactness: sigmoid is strictly monotone, so top-k ordering and the
    confidence threshold commute with the selection — the (scores, boxes)
    the NMS sees are bit-identical to ``decode_inference`` + NMS
    ``pre_topk=k`` (tested in tests/test_predict_topk.py), at ~K/A of the
    decode cost (A = 8400 at 640px; the DFL softmax over 4*reg_max bins,
    dist2bbox, and the kpt decode are the non-conv fat of the predict
    profile). The reference decodes every anchor then conf-filters
    (Head.cs:107-223 + Ops.cs:239-282); on TPU the fixed-K gather is the
    native formulation.

    Returns ``(pred (B, C, K), truncated (B,))`` where pred matches the
    decode_inference channel layout and truncated flags images whose
    above-threshold candidate count exceeded K (callers OR it into the
    NMS output's flag).
    """
    cls_l = flatten_levels(branch["cls"])               # (B, A, nc) logits
    conf_l = cls_l.max(-1).astype(jnp.float32)          # (B, A)
    a = conf_l.shape[-1]
    k = min(k, a)
    top_l, top_idx = jax.lax.top_k(conf_l, k)           # (B, K)
    ct = jnp.float32(conf_thres)
    thr_logit = jnp.log(ct) - jnp.log1p(-ct)
    truncated = (conf_l > thr_logit).sum(-1) > k

    feat_shapes = [m.shape[1:3] for m in branch["box"]]
    anchors, strides = make_anchors(feat_shapes, STRIDES)
    anc_k = jnp.take(anchors, top_idx, axis=0)          # (B, K, 2)
    str_k = jnp.take(strides, top_idx, axis=0)          # (B, K, 1)

    def gather(levels):
        flat = flatten_levels(levels)                   # (B, A, C)
        return jnp.take_along_axis(flat, top_idx[..., None], axis=1)

    dist = dfl_decode(gather(branch["box"]), reg_max)   # (B, K, 4)
    if "angle" in branch:
        angle = gather(branch["angle"]).astype(jnp.float32)
        dbox = dist2rbox(dist, angle, anc_k) * str_k
    else:
        dbox = dist2bbox(dist, anc_k, xywh=True) * str_k
    scores = jax.nn.sigmoid(gather(branch["cls"]).astype(jnp.float32))
    parts = [dbox, scores]
    if "mask" in branch:
        parts.append(gather(branch["mask"]).astype(jnp.float32))
    if "kpt" in branch:
        kpts = gather(branch["kpt"]).astype(jnp.float32)
        b, _, _ = kpts.shape
        kpts = kpts.reshape(b, k, kpt_num, kpt_dim)
        xy = (kpts[..., :2] * 2.0 + (anc_k[:, :, None] - 0.5)) \
            * str_k[:, :, None]
        if kpt_dim == 3:
            kpts = jnp.concatenate([xy, jax.nn.sigmoid(kpts[..., 2:3])], -1)
        else:
            kpts = xy
        parts.append(kpts.reshape(b, k, kpt_num * kpt_dim))
    if "angle" in branch:
        parts.append(angle)
    return jnp.concatenate(parts, axis=-1).swapaxes(-1, -2), truncated


def e2e_postprocess(pred: jnp.ndarray, *, nc: int, max_det: int = 300,
                    extra: int = 0) -> jnp.ndarray:
    """NMS-free top-k select (Head.cs postprocess/get_topk_index:117-196).

    pred: (B, A, 4 + nc + extra) with xyxy boxes. Returns
    (B, max_det, 6 + extra): [x1, y1, x2, y2, score, cls, extras...].
    """
    boxes = pred[..., :4]
    scores = pred[..., 4:4 + nc]
    extras = pred[..., 4 + nc:]
    b, a, _ = scores.shape
    k = min(max_det, a)

    best = scores.max(-1)                              # (B, A)
    _, ori_index = jax.lax.top_k(best, k)              # (B, K)
    sel_scores = jnp.take_along_axis(scores, ori_index[..., None], 1)
    flat_scores, flat_idx = jax.lax.top_k(sel_scores.reshape(b, -1), k)
    anchor_of = jnp.take_along_axis(ori_index, flat_idx // nc, 1)  # (B, K)
    cls_of = (flat_idx % nc).astype(jnp.float32)

    out_boxes = jnp.take_along_axis(boxes, anchor_of[..., None], 1)
    out_extras = jnp.take_along_axis(extras, anchor_of[..., None], 1)
    return jnp.concatenate(
        [out_boxes, flat_scores[..., None], cls_of[..., None], out_extras],
        axis=-1)


def pad_to_multiple(img: jnp.ndarray, multiple: int = 32,
                    value: float = 114.0) -> jnp.ndarray:
    """Bottom/right pad (B, H, W, C) to a stride multiple (Detector.cs:35-41)."""
    h, w = img.shape[1:3]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                      constant_values=value)
    return img
