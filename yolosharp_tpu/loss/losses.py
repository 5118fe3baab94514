"""Task losses: detection / OBB / segmentation / pose / classification,
plus End2End dual-head wrappers.

Functional parity target: YoloSharp/Utils/Loss.cs:94-1295 (DFLoss, BboxLoss,
RotatedBboxLoss, KeypointLoss, v8DetectionLoss, v8OBBLoss,
v8SegmentationLoss, v8PoseLoss, v8ClassificationLoss, E2E*Loss).

All losses are pure functions over padded batches:
  batch = {
    "cls":       (B, M) int32   class ids (padding arbitrary),
    "bboxes":    (B, M, 4|5)    normalized xywh (+radians for OBB),
    "mask_gt":   (B, M) bool    gt validity,
    "masks":     (B, mh, mw)    seg only: overlap-encoded instance masks,
    "keypoints": (B, M, K, kd)  pose only: normalized x,y (+visibility),
  }
Per-batch device->host syncs the reference performs inside the loss
(fg_mask.sum().item() etc.) are replaced by where-masks, so the whole train
step stays on device.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.anchors import (bbox2dist, dfl_decode, dist2bbox, dist2rbox,
                           make_anchors, rbox2dist)
from ..ops.boxes import xywh2xyxy, xyxy2xywh
from ..ops.iou import bbox_iou, probiou
from ..ops.masks import crop_mask
from .tal import assign

OKS_SIGMA = jnp.array([.26, .25, .25, .35, .35, .79, .79, .72, .72, .62,
                       .62, 1.07, 1.07, .87, .87, .89, .89]) / 10.0

STRIDES = (8, 16, 32)


def flatten_levels(maps) -> jnp.ndarray:
    """[(B,H,W,C)] x levels -> (B, A, C)."""
    b = maps[0].shape[0]
    return jnp.concatenate(
        [m.reshape(b, -1, m.shape[-1]) for m in maps], axis=1)


def bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (torch-compatible)."""
    return (jnp.clip(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _dfl_loss(pred_dist_logits, target, reg_max):
    """Distribution focal loss per anchor (Loss.cs:94-120).

    pred_dist_logits: (..., 4, reg_max); target: (..., 4) distances.
    Returns (...,) mean-over-coords loss.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist_logits.astype(jnp.float32), axis=-1)
    # bin selection as a masked reduce, NOT take_along_axis: on TPU the
    # gather (and its scatter-add transpose in backward) lowers HBM-bound —
    # xprof measured the two gathers at ~4 ms of a ~13 ms v8n-320 b16 train
    # step. The where+sum fuses into one VPU pass and its gradient is the
    # same mask (no scatter). Exact: selects the identical element.
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    ce_l = -jnp.where(bins == tl[..., None], logp, 0.0).sum(-1)
    tr_c = jnp.clip(tr, 0, reg_max - 1)
    ce_r = -jnp.where(bins == tr_c[..., None], logp, 0.0).sum(-1)
    return (ce_l * wl + ce_r * wr).mean(-1)


def take_gt(values, idx):
    """values: (B, M, ...), idx: (B, A) int32 -> (B, A, ...) selection as a
    one-hot matmul over the small gt axis M. On TPU take_along_axis lowers
    as an HBM-bound gather (and a scatter-add in any backward); the
    one-hot dot rides the MXU/VPU and its gradient is another dot. Exact:
    each output element is value*1.0 plus zeros."""
    m = values.shape[1]
    oh = jax.nn.one_hot(idx, m, dtype=values.dtype)       # (B, A, M)
    flat = values.reshape(values.shape[0], m, -1)         # (B, M, C)
    out = jnp.einsum("bam,bmc->bac", oh, flat,
                     preferred_element_type=values.dtype)
    return out.reshape(idx.shape + values.shape[2:])


class DetOut(NamedTuple):
    """Assignment byproducts needed by seg/pose heads."""

    loss_box: jnp.ndarray
    loss_cls: jnp.ndarray
    loss_dfl: jnp.ndarray
    fg_mask: jnp.ndarray        # (B, A)
    target_gt_idx: jnp.ndarray  # (B, A)
    target_bboxes: jnp.ndarray  # (B, A, 4) image units (xyxy)
    anchor_points: jnp.ndarray  # (A, 2) grid units
    stride_tensor: jnp.ndarray  # (A, 1)
    target_scores_sum: jnp.ndarray


def _imgsz(preds) -> Tuple[int, int]:
    h, w = preds["box"][0].shape[1:3]
    return h * STRIDES[0], w * STRIDES[0]


def _det_core(preds: Dict, batch: Dict, *, nc: int, reg_max: int = 16,
              tal_topk: int = 10, tal_topk2: int | None = None) -> DetOut:
    """Shared detection path (Loss.cs get_assigned_targets_and_loss:411-468)."""
    pred_distri = flatten_levels(preds["box"])   # (B, A, 4*reg_max)
    pred_scores = flatten_levels(preds["cls"])   # (B, A, nc) logits
    feat_shapes = [m.shape[1:3] for m in preds["box"]]
    anchor_points, stride_tensor = make_anchors(feat_shapes, STRIDES)
    ih, iw = _imgsz(preds)
    b, a, _ = pred_scores.shape

    gt_labels = batch["cls"].astype(jnp.int32)
    scale = jnp.asarray([iw, ih, iw, ih], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["bboxes"][..., :4] * scale)
    mask_gt = batch["mask_gt"].astype(bool) & (gt_bboxes.sum(-1) > 0)

    pred_dist4 = dfl_decode(pred_distri, reg_max)          # (B, A, 4) f32
    pred_bboxes = dist2bbox(pred_dist4, anchor_points, xywh=False)

    res = assign(jax.nn.sigmoid(pred_scores.astype(jnp.float32)),
                 pred_bboxes * stride_tensor, anchor_points * stride_tensor,
                 gt_labels, gt_bboxes, mask_gt,
                 topk=tal_topk, topk2=tal_topk2, num_classes=nc)

    tss = jnp.maximum(res.target_scores.sum(), 1.0)

    loss_cls = bce_logits(pred_scores.astype(jnp.float32),
                          res.target_scores).sum() / tss

    fg = res.fg_mask.astype(jnp.float32)
    weight = res.target_scores.sum(-1) * fg                 # (B, A)
    tgt_strided = res.target_bboxes / stride_tensor
    iou = bbox_iou(pred_bboxes, tgt_strided, xywh=False, CIoU=True)[..., 0]
    loss_box = ((1.0 - iou) * weight).sum() / tss

    target_ltrb = bbox2dist(anchor_points, tgt_strided, reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(b, a, 4, reg_max), target_ltrb,
                    reg_max)
    loss_dfl = (dfl * weight).sum() / tss

    return DetOut(loss_box, loss_cls, loss_dfl, res.fg_mask,
                  res.target_gt_idx, res.target_bboxes, anchor_points,
                  stride_tensor, tss)


def detection_loss(preds: Dict, batch: Dict, *, nc: int, reg_max: int = 16,
                   tal_topk: int = 10, tal_topk2: int | None = None,
                   hyp_box: float = 7.5, hyp_cls: float = 0.5,
                   hyp_dfl: float = 1.5):
    """v8DetectionLoss (Loss.cs:328-484). Returns (loss, items[3])."""
    b = preds["box"][0].shape[0]
    out = _det_core(preds, batch, nc=nc, reg_max=reg_max, tal_topk=tal_topk,
                    tal_topk2=tal_topk2)
    items = jnp.stack([out.loss_box * hyp_box, out.loss_cls * hyp_cls,
                       out.loss_dfl * hyp_dfl])
    return items.sum() * b, items


def obb_loss(preds: Dict, batch: Dict, *, nc: int, reg_max: int = 16,
             tal_topk: int = 10, tal_topk2: int | None = None,
             hyp_box: float = 7.5, hyp_cls: float = 0.5, hyp_dfl: float = 1.5,
             hyp_angle: float = 1.0, lambda_val: float = 3.0):
    """v8OBBLoss incl. aspect-weighted sin^2(2*dtheta) angle loss
    (Loss.cs:486-683). Returns (loss, items[4])."""
    pred_distri = flatten_levels(preds["box"])
    pred_scores = flatten_levels(preds["cls"])
    pred_angle = flatten_levels(preds["angle"])            # (B, A, 1)
    feat_shapes = [m.shape[1:3] for m in preds["box"]]
    anchor_points, stride_tensor = make_anchors(feat_shapes, STRIDES)
    ih, iw = _imgsz(preds)
    b, a, _ = pred_scores.shape

    gt_labels = batch["cls"].astype(jnp.int32)
    bb = batch["bboxes"]                                   # (B, M, 5) norm
    scale = jnp.asarray([iw, ih, iw, ih], jnp.float32)
    gt_xywh = bb[..., :4] * scale
    gt_bboxes = jnp.concatenate([gt_xywh, bb[..., 4:5]], -1)
    # filter tiny rboxes (<2px) as in Loss.cs:559-561
    mask_gt = (batch["mask_gt"].astype(bool)
               & (gt_xywh[..., 2] >= 2) & (gt_xywh[..., 3] >= 2))

    pred_dist4 = dfl_decode(pred_distri, reg_max)
    rbox = dist2rbox(pred_dist4, pred_angle.astype(jnp.float32),
                     anchor_points)
    pred_bboxes = jnp.concatenate([rbox, pred_angle.astype(jnp.float32)], -1)

    assigner_boxes = jnp.concatenate(
        [pred_bboxes[..., :4] * stride_tensor, pred_bboxes[..., 4:5]], -1)
    res = assign(jax.nn.sigmoid(pred_scores.astype(jnp.float32)),
                 assigner_boxes, anchor_points * stride_tensor,
                 gt_labels, gt_bboxes, mask_gt,
                 topk=tal_topk, topk2=tal_topk2, num_classes=nc,
                 rotated=True)

    tss = jnp.maximum(res.target_scores.sum(), 1.0)
    loss_cls = bce_logits(pred_scores.astype(jnp.float32),
                          res.target_scores).sum() / tss

    fg = res.fg_mask.astype(jnp.float32)
    weight = res.target_scores.sum(-1) * fg
    tgt = res.target_bboxes
    tgt = jnp.concatenate([tgt[..., :4] / stride_tensor, tgt[..., 4:5]], -1)

    iou = probiou(pred_bboxes, tgt)[..., 0]
    loss_box = ((1.0 - iou) * weight).sum() / tss

    target_ltrb = rbox2dist(tgt[..., :4], anchor_points, tgt[..., 4:5],
                            reg_max=reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(b, a, 4, reg_max), target_ltrb,
                    reg_max)
    loss_dfl = (dfl * weight).sum() / tss

    # angle loss (Loss.cs:657-677)
    w_gt, h_gt = tgt[..., 2], tgt[..., 3]
    log_ar = jnp.log((w_gt + 1e-9) / (h_gt + 1e-9))
    scale_w = jnp.exp(-(log_ar ** 2) / (lambda_val ** 2))
    dtheta = pred_bboxes[..., 4] - tgt[..., 4]
    dtheta = dtheta - jnp.round(dtheta / math.pi) * math.pi
    ang = jnp.sin(2 * dtheta) ** 2 * scale_w * weight
    loss_angle = ang.sum() / tss

    items = jnp.stack([loss_box * hyp_box, loss_cls * hyp_cls,
                       loss_dfl * hyp_dfl, loss_angle * hyp_angle])
    return items.sum() * b, items


def segmentation_loss(preds: Dict, batch: Dict, *, nc: int,
                      reg_max: int = 16, tal_topk: int = 10,
                      tal_topk2: int | None = None, overlap: bool = True,
                      hyp_box: float = 7.5, hyp_cls: float = 0.5,
                      hyp_dfl: float = 1.5, max_fg: int | None = None):
    """v8SegmentationLoss (Loss.cs:688-863). Returns (loss, items[5]).

    The per-image python loop over fg anchors becomes a fixed-slot gather +
    masked einsum (static shapes). The slot count is the PROVABLE upper
    bound on foreground anchors — TAL's select_highest_overlaps dedups to
    at most tal_topk anchors per gt, so F = min(A, topk * max_labels) loses
    nothing (round 1 silently truncated at 256, dropping mask gradients in
    crowded scenes). `max_fg` overrides the bound (memory knob only; a
    value below the bound re-introduces truncation). items layout mirrors
    the reference: [box, seg, cls, dfl, semseg]; the semseg slot computes
    the reference's optional BCE+Dice branch when preds["semseg"] logits
    and batch["sem_masks"] ids are both present (Loss.cs:745-770), else 0.
    Masks must be overlap-encoded (instance id + 1 per pixel), the
    reference's default.
    """
    assert overlap, "only overlap-encoded masks are supported"
    out = _det_core(preds, batch, nc=nc, reg_max=reg_max, tal_topk=tal_topk,
                    tal_topk2=tal_topk2)
    proto = preds["proto"]                   # (B, mh, mw, nm)
    pred_masks = flatten_levels(preds["mask"])  # (B, A, nm)
    b, mh, mw, nm = proto.shape
    ih, iw = _imgsz(preds)

    masks = batch["masks"].astype(jnp.float32)   # (B, mh', mw') overlap ids
    if masks.shape[1:] != (mh, mw):
        # the reference interpolates PROTO to the mask size (Loss.cs:739-743);
        # we resize masks to proto size instead (single bilinear, on device)
        masks = jax.image.resize(masks, (b, mh, mw), "nearest")

    # exact static foreground bound: <= tal_topk anchors per gt instance
    if max_fg is None:
        topk = max(tal_topk, tal_topk2 or 0)
        max_fg = topk * batch["cls"].shape[1]
    fg = out.fg_mask.astype(jnp.float32)
    score, idx = jax.lax.top_k(fg, min(max_fg, fg.shape[-1]))   # (B, F)
    valid = score > 0.0
    coeff = jnp.take_along_axis(pred_masks, idx[..., None], 1)  # (B, F, nm)
    gt_idx = jnp.take_along_axis(out.target_gt_idx, idx, 1)     # (B, F)
    boxes = jnp.take_along_axis(out.target_bboxes, idx[..., None], 1)

    norm = jnp.asarray([iw, ih, iw, ih], jnp.float32)
    boxes_n = boxes / norm
    marea = xyxy2xywh(boxes_n)[..., 2:4].prod(-1)               # (B, F)
    mxyxy = boxes_n * jnp.asarray([mw, mh, mw, mh], jnp.float32)

    # F-chunked, batch-vectorized mask loss. The round-5 xprof of the
    # production v11m-seg step (scripts/profile_seg_render.py) showed the
    # previous per-image lax.map serialized into an 8-iteration while
    # loop whose (F, mh, mw) intermediates dominated the step (~42% loop
    # fusion + DUS residual stacking): with M=168 padded labels, F =
    # 10*168 slots materialize ~1.4 GB forward AND again as stacked scan
    # residuals. Chunking F keeps the transient at (B, CH, mh, mw) and
    # jax.checkpoint recomputes the chunk in backward instead of storing
    # it. Exact same math (slot sum is order-independent).
    ch = min(256, max_fg)
    f = coeff.shape[1]
    n_ch = -(-f // ch)
    pad = n_ch * ch - f

    def pad_ch(x):
        cfg_pad = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, cfg_pad)
        x = x.reshape(b, n_ch, ch, *x.shape[2:])
        return jnp.moveaxis(x, 1, 0)                # (n_ch, B, CH, ...)

    xs = (pad_ch(coeff), pad_ch(gt_idx.astype(jnp.float32)),
          pad_ch(mxyxy), pad_ch(marea.astype(jnp.float32)),
          pad_ch(valid.astype(jnp.float32)))
    proto32 = proto.astype(jnp.float32)
    masks_b = masks

    @jax.checkpoint
    def chunk_sum(args):
        coeff_c, gt_idx_c, mxyxy_c, marea_c, valid_c = args
        pm = jnp.einsum("bfc,bhwc->bfhw", coeff_c.astype(jnp.float32),
                        proto32)                    # (B, CH, mh, mw)
        gt = (masks_b[:, None] == (gt_idx_c[..., None, None] + 1.0))
        l = bce_logits(pm, gt.astype(jnp.float32))
        l = crop_mask(l.reshape(b * ch, mh, mw),
                      mxyxy_c.reshape(b * ch, 4)).reshape(b, ch, mh, mw)
        l = l.mean((2, 3)) / jnp.maximum(marea_c, 1e-7)
        return (l * valid_c).sum()

    def body(carry, args):
        return carry + chunk_sum(args), None

    total, _ = jax.lax.scan(body, jnp.zeros(()), xs)
    loss_seg = total / jnp.maximum(fg.sum(), 1.0)

    # optional semantic-seg branch (Loss.cs:745-770): BCE+Dice over
    # preds["semseg"] logits (B, h, w, nc) vs one-hot batch["sem_masks"]
    # class ids, with background (instance canvas == 0) zeroed under
    # overlap encoding, gated — like the reference — on fg anchors
    # existing, and weighted by the box gain (Loss.cs:768-769).
    loss_semseg = jnp.zeros(())
    if "semseg" in preds and "sem_masks" in batch:
        sem_gt = jax.nn.one_hot(batch["sem_masks"].astype(jnp.int32), nc,
                                dtype=jnp.float32)        # (B, H, W, nc)
        sem_gt = sem_gt * (batch["masks"] > 0)[..., None].astype(jnp.float32)
        semseg_val = bce_dice_loss(preds["semseg"].astype(jnp.float32),
                                   sem_gt) * hyp_box
        loss_semseg = jnp.where(fg.sum() > 0, semseg_val, 0.0)

    items = jnp.stack([out.loss_box * hyp_box, loss_seg * hyp_box,
                       out.loss_cls * hyp_cls, out.loss_dfl * hyp_dfl,
                       loss_semseg])
    return items.sum() * b, items


def pose_loss(preds: Dict, batch: Dict, *, nc: int, kpt_num: int = 17,
              kpt_dim: int = 3, reg_max: int = 16, tal_topk: int = 10,
              tal_topk2: int | None = 10, hyp_box: float = 7.5,
              hyp_cls: float = 0.5, hyp_dfl: float = 1.5,
              hyp_pose: float = 12.0, hyp_kobj: float = 1.0):
    """v8PoseLoss (Loss.cs:870-1070). Returns (loss, items[5]):
    [box, pose, kobj, cls, dfl]."""
    out = _det_core(preds, batch, nc=nc, reg_max=reg_max, tal_topk=tal_topk,
                    tal_topk2=tal_topk2)
    b = preds["box"][0].shape[0]
    a = out.fg_mask.shape[-1]
    ih, iw = _imgsz(preds)

    pred_kpts = flatten_levels(preds["kpt"]).reshape(b, a, kpt_num, kpt_dim)
    # kpts_decode (Loss.cs:977-984)
    anc = out.anchor_points                                  # (A, 2)
    xy = pred_kpts[..., :2] * 2.0 + (anc[None, :, None, :] - 0.5)
    pred_kpts = jnp.concatenate([xy, pred_kpts[..., 2:]], -1)

    # gt keypoints scaled to pixels then to grid units of each anchor
    gt_kpts = batch["keypoints"].astype(jnp.float32)         # (B, M, K, kd)
    scale = jnp.asarray([iw, ih], jnp.float32)
    gt_xy = gt_kpts[..., :2] * scale
    gt_kpts = jnp.concatenate([gt_xy, gt_kpts[..., 2:]], -1)

    sel = take_gt(gt_kpts, out.target_gt_idx)               # (B, A, K, kd)
    sel_xy = sel[..., :2] / out.stride_tensor[None, :, :, None][..., 0:1]
    sel = jnp.concatenate([sel_xy, sel[..., 2:]], -1)

    fg = out.fg_mask.astype(jnp.float32)                     # (B, A)
    tgt_strided = out.target_bboxes / out.stride_tensor
    area = xyxy2xywh(tgt_strided)[..., 2:4].prod(-1)         # (B, A)

    kpt_mask = (sel[..., 2] != 0) if kpt_dim == 3 else jnp.ones(
        sel.shape[:-1], bool)
    kpt_mask = kpt_mask.astype(jnp.float32)
    d = ((pred_kpts[..., 0] - sel[..., 0]) ** 2
         + (pred_kpts[..., 1] - sel[..., 1]) ** 2)           # (B, A, K)
    sigmas = OKS_SIGMA if (kpt_num == 17 and kpt_dim == 3) else (
        jnp.ones(kpt_num) / kpt_num)
    e = d / ((2 * sigmas) ** 2 * (area[..., None] + 1e-9) * 2)
    factor = kpt_num / (kpt_mask.sum(-1) + 1e-6)             # (B, A)
    per_anchor = (factor[..., None] * (1 - jnp.exp(-e)) * kpt_mask).mean(-1)
    n_fg = jnp.maximum(fg.sum(), 1.0)
    loss_pose = (per_anchor * fg).sum() / n_fg

    if kpt_dim == 3:
        kobj = bce_logits(pred_kpts[..., 2], kpt_mask).mean(-1)
        loss_kobj = (kobj * fg).sum() / n_fg
    else:
        loss_kobj = jnp.zeros(())

    items = jnp.stack([out.loss_box * hyp_box, loss_pose * hyp_pose,
                       loss_kobj * hyp_kobj, out.loss_cls * hyp_cls,
                       out.loss_dfl * hyp_dfl])
    return items.sum() * b, items


def classification_loss(preds: Dict, batch: Dict):
    """v8ClassificationLoss: plain mean CE (Loss.cs:1073-1091)."""
    logits = preds["cls"].astype(jnp.float32)
    labels = batch["cls"].reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], -1).mean()
    return loss, jnp.stack([loss])


def focal_loss(logits, targets, gamma: float = 1.5, alpha: float = 0.25):
    """Focal loss over BCE-with-logits (Loss.cs:55-92)."""
    loss = bce_logits(logits, targets)
    prob = jax.nn.sigmoid(logits)
    p_t = targets * prob + (1 - targets) * (1 - prob)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return (loss * alpha_factor * (1.0 - p_t) ** gamma).mean()


def bce_blur_loss(logits, targets, alpha: float = 0.05):
    """BCE with missing-label blur (Loss.cs:29-53)."""
    loss = bce_logits(logits, targets)
    pred = jax.nn.sigmoid(logits)
    dx = pred - targets
    alpha_factor = 1 - jnp.exp((dx - 1) / (alpha + 1e-4))
    return (loss * alpha_factor).mean()


def multi_channel_dice_loss(pred_logits, target, smooth: float = 1e-6):
    """Multi-channel Dice on NHWC (B, H, W, C) masks (Loss.cs:233-278):
    per-(image, channel) dice over the spatial dims, channel mean, then
    batch mean."""
    pred = jax.nn.sigmoid(pred_logits)
    inter = (pred * target).sum((1, 2))               # (B, C)
    union = pred.sum((1, 2)) + target.sum((1, 2))
    dice = (2.0 * inter + smooth) / (union + smooth)
    return (1.0 - dice).mean(-1).mean()


def bce_dice_loss(pred_logits, target, weight_bce: float = 0.5,
                  weight_dice: float = 0.5):
    """Combined BCE + Dice for semantic-seg heads (Loss.cs:283-325), NHWC.

    target is nearest-resized to the pred size when they differ
    (Loss.cs:317-321). NB the reference constructs its
    MultiChannelDiceLoss with smooth=1 (Loss.cs:301), not the class's
    1e-6 default.
    """
    b, h, w, c = pred_logits.shape
    if target.shape[1:3] != (h, w):
        # torch F.interpolate(mode="nearest") picks src = floor(dst*scale)
        # (jax.image.resize's pixel-center nearest picks different pixels)
        H, W = target.shape[1:3]
        ri = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
        ci = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
        target = target[:, ri][:, :, ci]
    bce = bce_logits(pred_logits, target).mean()
    return (weight_bce * bce
            + weight_dice * multi_channel_dice_loss(pred_logits, target,
                                                    smooth=1.0))


def e2e_wrap(loss_fn_many, loss_fn_one):
    """End2End dual loss: one2many + one2one with o2m/o2o gains.

    Mirrors E2EDetectLoss/E2EOBBLoss/... (Loss.cs:1094-1295). gains (o2m,
    o2o) are traced scalars so the epoch-decay schedule stays jit-friendly.
    """

    def fn(preds, batch, o2m_gain=1.0, o2o_gain=1.0):
        l_many, i_many = loss_fn_many(preds["one2many"], batch)
        l_one, i_one = loss_fn_one(preds["one2one"], batch)
        return (l_many * o2m_gain + l_one * o2o_gain,
                i_many * o2m_gain + i_one * o2o_gain)

    return fn


def e2e_gain_schedule(epoch: int, epochs: int, init_o2m: float = 0.8,
                      final_o2m: float = 0.1) -> Tuple[float, float]:
    """o2m/o2o gain decay over epochs (Loss.cs:1166-1176)."""
    x = float(epoch)
    o2m = max(1 - x / max(epochs - 1, 1), 0) * (init_o2m - final_o2m) + final_o2m
    return o2m, max(1.0 - o2m, 0.0)
