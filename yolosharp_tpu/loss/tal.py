"""Task-Aligned Assigner — fully padded, branch-free, jit/vmap-safe.

Functional parity target: YoloSharp/Utils/Tal.cs:13-310 (TaskAlignedAssigner,
RotatedTaskAlignedAssigner). The reference is dynamic-shape torch with
boolean fancy-indexing and data-dependent branches; this version is a pure
function over fixed (B, M, A) tensors:

 - ground truths are padded to M slots with a validity mask;
 - the data-dependent "any anchor matched >1 gt" branch (Tal.cs:231) is
   applied unconditionally via where-masks (equivalent semantics);
 - the reference's masked-fill(0)+scatter dedup quirk in
   select_topk_candidates (Tal.cs:155-165) is replicated exactly, including
   the anchor-0 over-count zeroing artifact.

Everything runs under stop_gradient (the reference wraps forward in
torch.no_grad, Tal.cs:52).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import xywh2xyxy, xyxy2xywh, xywhr2xyxyxyxy
from ..ops.iou import bbox_iou, probiou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray   # (B, A) int32
    target_bboxes: jnp.ndarray   # (B, A, 4|5)
    target_scores: jnp.ndarray   # (B, A, nc)
    fg_mask: jnp.ndarray         # (B, A) bool
    target_gt_idx: jnp.ndarray   # (B, A) int32


def _select_candidates_in_gts(anc_points, gt_bboxes, mask_gt, min_stride,
                              stride_val, eps=1e-9):
    """Anchor-center-in-box test with tiny-gt inflation (Tal.cs:202-223)."""
    xywh = xyxy2xywh(gt_bboxes)
    wh = xywh[..., 2:4]
    small = (wh < min_stride) & mask_gt[..., None]
    wh = jnp.where(small, jnp.asarray(stride_val, wh.dtype), wh)
    boxes = xywh2xyxy(jnp.concatenate([xywh[..., :2], wh], -1))
    lt = boxes[..., None, :2]   # (B, M, 1, 2)
    rb = boxes[..., None, 2:4]
    pts = anc_points[None, None]  # (1, 1, A, 2)
    deltas = jnp.concatenate([pts - lt, rb - pts], axis=-1)  # (B, M, A, 4)
    return deltas.min(-1) > eps  # (B, M, A)


def _select_candidates_in_rotated_gts(anc_points, gt_bboxes, mask_gt,
                                      min_stride, stride_val):
    """Point-in-rotated-rect test with tiny-gt inflation (Tal.cs:279-308)."""
    wh = gt_bboxes[..., 2:4]
    small = (wh < min_stride) & mask_gt[..., None]
    wh = jnp.where(small, jnp.asarray(stride_val, wh.dtype), wh)
    boxes = jnp.concatenate([gt_bboxes[..., :2], wh, gt_bboxes[..., 4:5]], -1)
    corners = xywhr2xyxyxyxy(boxes)           # (B, M, 4, 2)
    a, b, d = corners[..., 0, :], corners[..., 1, :], corners[..., 3, :]
    ab = b - a
    ad = d - a
    ap = anc_points[None, None] - a[..., None, :]  # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1)[..., None]
    norm_ad = (ad * ad).sum(-1)[..., None]
    ap_ab = (ap * ab[..., None, :]).sum(-1)
    ap_ad = (ap * ad[..., None, :]).sum(-1)
    return ((ap_ab >= 0) & (ap_ab <= norm_ab)
            & (ap_ad >= 0) & (ap_ad <= norm_ad))


def _topk_mask_iter(metrics, topk):
    """0/1 membership mask of the top-k entries along the last axis.

    Exactly equivalent to one_hot(lax.top_k(metrics, k).indices).sum(-2)
    for the membership question: both lax.top_k and argmax break ties by
    smallest index, so the selected SET is identical. K argmax+mask passes
    are plain VPU reductions; lax.top_k lowers to a sort on TPU that xprof
    attributed ~6% of the v8n train step to (docs/ROUND_NOTES.md round 3).
    """
    a = metrics.shape[-1]
    neg = jnp.finfo(metrics.dtype).min

    def body(carry, _):
        m, mask = carry
        oh = jax.nn.one_hot(m.argmax(-1), a, dtype=metrics.dtype)
        return (jnp.where(oh > 0, neg, m), mask + oh), None

    (_, mask), _ = jax.lax.scan(
        body, (metrics, jnp.zeros_like(metrics)), None, length=topk)
    return mask


def _select_topk_candidates(metrics, mask_gt, topk):
    """Reference-exact top-k mask incl. the scatter-dedup quirk.

    The reference (Tal.cs:155-165) masked-fills invalid-gt rows' indices to
    0 and zeroes any anchor counted >1; since top-k indices are distinct,
    that reduces to: membership mask for valid gt rows, all-zero rows for
    invalid gts — which is what the iterative mask * mask_gt computes.
    """
    mask = _topk_mask_iter(metrics, topk)
    return mask * mask_gt[..., None].astype(metrics.dtype)


@partial(jax.jit, static_argnames=("topk", "topk2", "num_classes", "alpha",
                                   "beta", "rotated", "min_stride",
                                   "stride_val"))
def assign(pd_scores: jnp.ndarray,      # (B, A, nc) sigmoided
           pd_bboxes: jnp.ndarray,      # (B, A, 4|5) image units
           anc_points: jnp.ndarray,     # (A, 2) image units
           gt_labels: jnp.ndarray,      # (B, M) int32
           gt_bboxes: jnp.ndarray,      # (B, M, 4|5)
           mask_gt: jnp.ndarray,        # (B, M) bool
           *,
           topk: int = 10,
           topk2: int | None = None,
           num_classes: int = 80,
           alpha: float = 0.5,
           beta: float = 6.0,
           rotated: bool = False,
           min_stride: int = 8,
           stride_val: int = 16,
           eps: float = 1e-9) -> AssignResult:
    """Task-aligned assignment: align = score^alpha * IoU^beta."""
    pd_scores, pd_bboxes, gt_bboxes = map(
        jax.lax.stop_gradient, (pd_scores, pd_bboxes, gt_bboxes))
    topk2 = topk if topk2 is None else topk2
    b, a, nc = pd_scores.shape
    m = gt_labels.shape[1]
    mask_gt = mask_gt.astype(bool)

    if rotated:
        mask_in_gts = _select_candidates_in_rotated_gts(
            anc_points, gt_bboxes, mask_gt, min_stride, stride_val)
    else:
        mask_in_gts = _select_candidates_in_gts(
            anc_points, gt_bboxes, mask_gt, min_stride, stride_val)

    # --- box metrics (Tal.cs:114-137) ---
    # class-score selection as a one-hot dot over nc, not take_along_axis:
    # the (B, M, A) gather lowers HBM-bound on TPU while the dot rides the
    # MXU. Exact (one 1.0 per row, zeros elsewhere).
    labels = jnp.clip(gt_labels, 0, nc - 1)
    lab_oh = jax.nn.one_hot(labels.astype(jnp.int32), nc,
                            dtype=pd_scores.dtype)          # (B, M, nc)
    bbox_scores = jnp.einsum("bmc,bac->bma", lab_oh, pd_scores,
                             preferred_element_type=pd_scores.dtype)
    valid = mask_in_gts & mask_gt[..., None]
    bbox_scores = jnp.where(valid, bbox_scores, 0.0)

    gt_exp = gt_bboxes[:, :, None, :]          # (B, M, 1, C)
    pd_exp = pd_bboxes[:, None, :, :]          # (B, 1, A, C)
    if rotated:
        iou = probiou(gt_exp, pd_exp)[..., 0]
    else:
        iou = bbox_iou(gt_exp, pd_exp, xywh=False, CIoU=True)[..., 0]
    overlaps = jnp.where(valid, jnp.clip(iou, 0.0), 0.0)

    align_metric = bbox_scores ** alpha * overlaps ** beta

    # --- top-k + positive mask (Tal.cs:92-102) ---
    mask_topk = _select_topk_candidates(align_metric, mask_gt, topk)
    mask_pos = mask_topk * mask_in_gts * mask_gt[..., None]

    # --- resolve anchors matched to multiple gts (Tal.cs:225-241) ---
    fg = mask_pos.sum(-2)  # (B, A)
    multi = (fg[:, None, :] > 1)
    is_max = jax.nn.one_hot(overlaps.argmax(1), m, dtype=mask_pos.dtype,
                            axis=1)            # (B, M, A)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg = mask_pos.sum(-2)

    # --- secondary top-k filter (Tal.cs:242-250) ---
    if topk2 != topk:
        am2 = align_metric * mask_pos
        # membership-only top-k again (see _topk_mask_iter); the reference
        # keeps anchors whose one_hot count > 0 (Tal.cs:242-250)
        sel = _topk_mask_iter(am2, topk2)
        mask_pos = mask_pos * jnp.where(sel > 0, 1.0, 0.0)
        fg = mask_pos.sum(-2)

    target_gt_idx = mask_pos.argmax(-2).astype(jnp.int32)  # (B, A)
    fg_mask = fg > 0

    # --- gather targets (Tal.cs:170-199) ---
    # one-hot matmul over the small gt axis M, not take_along_axis: the
    # (B, A) label / (B, A, C) box gathers were the two largest single
    # ops of the round-4 packed train step (0.37 ms of 4.2 ms device
    # time, xprof hlo_stats) — they lower HBM-bound on TPU while the
    # dense (B, A, M) dot rides the MXU. Exact: one 1.0 per row selects
    # integer-valued labels / f32 boxes without rounding.
    # precision=HIGHEST: default matmul precision runs f32 einsums as
    # bf16 passes on TPU, which would quantize gt pixel coords (~2px at
    # 640) and round integer labels above 256 to wrong class ids. The
    # selection is 0/1 so HIGHEST makes it exact at negligible cost.
    pos_oh = jax.nn.one_hot(target_gt_idx, m, dtype=jnp.float32)
    tl = jnp.einsum("bam,bm->ba", pos_oh, gt_labels.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    target_labels = jnp.clip(tl, 0).astype(jnp.int32)
    target_bboxes = jnp.einsum(
        "bam,bmc->bac", pos_oh, gt_bboxes.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST).astype(gt_bboxes.dtype)
    target_scores = jax.nn.one_hot(target_labels, num_classes,
                                   dtype=pd_scores.dtype)
    target_scores = target_scores * fg_mask[..., None]

    # --- normalize by per-gt best align/overlap (Tal.cs:82-87) ---
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)       # (B, M, 1)
    pos_overlaps = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_metric * pos_overlaps / (pos_align + eps)).max(-2)  # (B, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores,
                        fg_mask, target_gt_idx)
