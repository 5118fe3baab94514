"""Static-shape, on-device non-maximum suppression.

Functional parity target: YoloSharp/Utils/Ops.cs:239-401 (non_max_suppression,
nms_rotated). The reference conf-filters then keeps up to max_nms=30000
candidates (Ops.cs:242,338-340) and runs dynamic-size torchvision.ops.nms; on
TPU everything is fixed-shape: candidates are pre-selected with lax.top_k
(``pre_topk=None`` keeps every anchor — exact reference semantics, since the
anchor count is always < 30000), suppression runs branch-free, and results
come back as a fixed (max_det, ...) block with a validity mask — one bulk
device->host transfer instead of the reference's scalar-by-scalar reads
(Models/Detector.cs:50-69).

Suppression modes:
 - greedy: exact torchvision-NMS semantics. Two TPU implementations chosen
   statically by candidate count K:
     * K <= matrix_k: monotone fixed-point iteration on the (K, K) IoU
       matrix — converges to the exact greedy keep-set in
       suppression-chain-depth steps (typically < 8), each step one fused
       masked any-reduce on the VPU.
     * K >  matrix_k: max_det-step argmax-and-suppress scan — exact greedy,
       O(K) memory, no (K, K) matrix.
 - fast: YOLACT-style single-shot triangular suppression. For rotated boxes
   this IS the reference algorithm (nms_rotated use_triu, Ops.cs:373-401).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

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
    truncated: jnp.ndarray  # (B,) bool — above-conf candidates exceeded
    #                         pre_topk (results may differ from exact NMS;
    #                         callers should warn, never silently accept)


def _greedy_suppress(iou: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Exact greedy NMS keep mask for *score-sorted* boxes.

    The greedy keep vector is the unique solution of
    ``keep[j] = ~any_{i<j}(over[i, j] & keep[i])`` (a strictly triangular
    recursion). The map F(keep) defined by that equation is antitone, so
    iterating from the all-ones vector converges to the unique fixed point
    in at most suppression-chain-depth steps (typically < 8); each step is
    one fused (K, K) masked any-reduce instead of the K-step sequential
    loop a literal translation would use.
    """
    k = iou.shape[0]
    over = (iou > thresh) & jnp.triu(jnp.ones((k, k), bool), k=1)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        new = ~jnp.any(over & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = jnp.ones((k,), bool)
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros((k,), bool), jnp.int32(0)))
    return keep


def _fast_suppress(iou: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """YOLACT fast-NMS: keep i iff no higher-scored j has iou > thresh."""
    k = iou.shape[0]
    upper = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)
    return ~jnp.any((iou > thresh) & upper, axis=0)


def _greedy_tiled(boxes, valid, iou_thres, tile, rotated):
    """Exact greedy NMS keep mask via a tile-sequential sweep.

    For large candidate pools the full (K, K) matrix is memory- and
    bandwidth-hostile; a per-pick argmax scan is latency-hostile (max_det
    sequential steps of tiny work). This sweep is the TPU middle ground:
    K/tile sequential steps, each a chunky (tile, K) IoU block — exact
    greedy semantics for *score-sorted* input.

    Per tile: (1) a box is pre-suppressed if any kept box from an earlier
    tile overlaps it; (2) the intra-tile triangular recursion is solved by
    the same antitone fixed-point iteration as _greedy_suppress, seeded
    with the pre-suppression mask.
    """
    k = boxes.shape[0]
    n_tiles = -(-k // tile)
    pad = n_tiles * tile - k
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    kp = boxes.shape[0]
    idx = jnp.arange(kp)
    tri = jnp.triu(jnp.ones((tile, tile), bool), k=1)

    def outer(keep, c):
        start = c * tile
        tb = jax.lax.dynamic_slice_in_dim(boxes, start, tile, 0)
        if rotated:
            iou_all = batch_probiou(tb, boxes)          # (tile, kp)
        else:
            iou_all = box_iou(tb, boxes)
        over_all = iou_all > iou_thres
        prev_kept = keep & (idx < start)
        sup = jnp.any(over_all & prev_kept[None, :], axis=1)
        tvalid = jax.lax.dynamic_slice_in_dim(valid, start, tile, 0)
        alive0 = ~sup & tvalid
        over_t = (jax.lax.dynamic_slice(
            over_all, (0, start), (tile, tile)) & tri
            & tvalid[:, None] & tvalid[None, :])

        def cond(state):
            kt, prev, it = state
            return jnp.any(kt != prev) & (it < tile)

        def body(state):
            kt, _, it = state
            new = alive0 & ~jnp.any(over_t & kt[:, None], axis=0)
            return new, kt, it + 1

        kt, _, _ = jax.lax.while_loop(
            cond, body, (alive0, jnp.zeros((tile,), bool), jnp.int32(0)))
        keep = jax.lax.dynamic_update_slice(keep, kt, (start,))
        return keep, None

    keep, _ = jax.lax.scan(outer, jnp.zeros((kp,), bool),
                           jnp.arange(n_tiles))
    return keep[:k]


@partial(jax.jit, static_argnames=(
    "max_det", "nc", "pre_topk", "agnostic", "rotated", "mode", "max_wh",
    "matrix_k"))
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    *,
    max_det: int = 300,
    nc: int = 0,
    pre_topk: Optional[int] = None,
    agnostic: bool = False,
    rotated: bool = False,
    mode: str = "greedy",
    max_wh: float = 7680.0,
    matrix_k: int = 2048,
) -> NMSOutput:
    """Batched fixed-shape NMS.

    Args:
      prediction: (B, 4+nc+E, A) raw head output — xywh boxes, class scores
        (already sigmoided), extras (mask coeffs / kpts; angle last when
        rotated). Channel-first to match the head contract.
      nc: number of classes (0 -> infer as C-4, no extras).
      pre_topk: candidate cap before suppression. None keeps every anchor
        (reference max_nms=30000 semantics — the anchor count is always
        smaller); an int trades a small dense-scene recall risk for speed.
      matrix_k: static switch point between the (K, K)-matrix greedy
        implementation and the O(K)-memory argmax-suppress scan.
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

    k = conf.shape[-1] if pre_topk is None else min(pre_topk, conf.shape[-1])
    top_conf, top_idx = jax.lax.top_k(conf, k)  # (B, K)
    truncated = ((conf > 0.0).sum(-1) > k) if k < conf.shape[-1] \
        else jnp.zeros((bs,), bool)
    # rotated NMS is the reference's triangular fast-NMS (Ops.cs:373-401),
    # which only exists as a matrix pass
    use_matrix = (mode == "fast") or rotated or k <= matrix_k

    def per_image(conf_k, idx, boxes_a, cls_a, extras_a):
        box = jnp.take_along_axis(boxes_a, idx[:, None], axis=0)
        cls = jnp.take(cls_a, idx)
        ext = jnp.take_along_axis(extras_a, idx[:, None], axis=0)
        valid = conf_k > 0.0

        offset = jnp.where(agnostic, 0.0, cls.astype(box.dtype) * max_wh)
        if rotated:
            # extras' last channel is the angle; box stays xywh + r.
            angle = ext[..., -1:]
            nms_box = jnp.concatenate([box[..., :2] + offset[:, None],
                                       box[..., 2:4], angle], axis=-1)
            out_box = jnp.concatenate([box, angle], axis=-1)
        else:
            xyxy = xywh2xyxy(box)
            nms_box = xyxy + offset[:, None] * jnp.ones((1, 4), box.dtype)
            out_box = xyxy

        if use_matrix:
            if rotated:
                iou = batch_probiou(nms_box, nms_box)
            else:
                iou = box_iou(nms_box, nms_box)
            # padding rows must never suppress: zero their IoU rows/cols
            vmat = valid[:, None] & valid[None, :]
            iou = jnp.where(vmat, iou, 0.0)
            if mode == "fast" or rotated:
                keep = _fast_suppress(iou, iou_thres) & valid
            else:
                keep = _greedy_suppress(iou, iou_thres) & valid
        else:
            keep = _greedy_tiled(nms_box, valid, iou_thres,
                                 tile=min(512, matrix_k), rotated=rotated)
        # compact kept rows to the front, cap at max_det
        keep_scores = jnp.where(keep, conf_k, -1.0)
        k_out = min(max_det, keep_scores.shape[-1])
        sel_scores, sel = jax.lax.top_k(keep_scores, k_out)
        if k_out < max_det:  # fewer anchors than max_det: pad the output
            pad = max_det - k_out
            sel_scores = jnp.pad(sel_scores, (0, pad),
                                 constant_values=-1.0)
            sel = jnp.pad(sel, (0, pad))

        ok = sel_scores > 0.0
        z = jnp.where(ok, 1.0, 0.0)
        return (jnp.take_along_axis(out_box, sel[:, None], 0) * z[:, None],
                sel_scores * z,
                jnp.take(cls, sel) * ok.astype(jnp.int32),
                jnp.take_along_axis(ext, sel[:, None], 0) * z[:, None],
                ok)

    out = jax.vmap(per_image)(top_conf, top_idx, boxes_xywh, cls_id, extras)
    return NMSOutput(*out, truncated)


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
