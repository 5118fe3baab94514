import math

import numpy as np
import jax.numpy as jnp

from yolosharp_tpu.ops import (batch_probiou, bbox_iou, box_iou, kpt_iou,
                               mask_iou, nms_rotated, non_max_suppression,
                               probiou, xywh2xyxy)

rng = np.random.default_rng(1)


def _np_box_iou(a, b, eps=1e-7):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(br - tl, 0, None).prod(-1)
    area_a = (a[:, 2:] - a[:, :2]).prod(-1)
    area_b = (b[:, 2:] - b[:, :2]).prod(-1)
    return inter / (area_a[:, None] + area_b[None] - inter + eps)


def _rand_xyxy(n):
    xy = rng.uniform(0, 400, size=(n, 2))
    wh = rng.uniform(5, 120, size=(n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_box_iou_pairwise():
    a, b = _rand_xyxy(37), _rand_xyxy(21)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_box_iou(a, b), rtol=1e-5, atol=1e-6)


def test_bbox_iou_identity_boxes():
    b = _rand_xyxy(10)
    for kw in ({}, {"GIoU": True}, {"DIoU": True}, {"CIoU": True}):
        iou = np.asarray(bbox_iou(jnp.asarray(b), jnp.asarray(b), xywh=False, **kw))
        np.testing.assert_allclose(iou, 1.0, atol=1e-4)


def test_bbox_iou_ciou_oracle():
    # independent numpy CIoU oracle (Zheng et al. 2019)
    b1, b2 = _rand_xyxy(50), _rand_xyxy(50)
    got = np.asarray(bbox_iou(jnp.asarray(b1), jnp.asarray(b2),
                              xywh=False, CIoU=True))[:, 0]
    eps = 1e-7
    w1, h1 = b1[:, 2] - b1[:, 0], np.clip(b1[:, 3] - b1[:, 1], eps, None)
    w2, h2 = b2[:, 2] - b2[:, 0], np.clip(b2[:, 3] - b2[:, 1], eps, None)
    inter = (np.clip(np.minimum(b1[:, 2], b2[:, 2]) - np.maximum(b1[:, 0], b2[:, 0]), 0, None)
             * np.clip(np.minimum(b1[:, 3], b2[:, 3]) - np.maximum(b1[:, 1], b2[:, 1]), 0, None))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = np.maximum(b1[:, 2], b2[:, 2]) - np.minimum(b1[:, 0], b2[:, 0])
    ch = np.maximum(b1[:, 3], b2[:, 3]) - np.minimum(b1[:, 1], b2[:, 1])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2[:, 0] + b2[:, 2] - b1[:, 0] - b1[:, 2]) ** 2
            + (b2[:, 1] + b2[:, 3] - b1[:, 1] - b1[:, 3]) ** 2) / 4
    v = 4 / math.pi**2 * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + 1 + eps)
    want = iou - (rho2 / c2 + v * alpha)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mask_iou():
    m1 = (rng.uniform(size=(4, 100)) > 0.5).astype(np.float32)
    m2 = (rng.uniform(size=(6, 100)) > 0.5).astype(np.float32)
    got = np.asarray(mask_iou(jnp.asarray(m1), jnp.asarray(m2)))
    inter = m1 @ m2.T
    union = m1.sum(1)[:, None] + m2.sum(1)[None] - inter
    np.testing.assert_allclose(got, inter / (union + 1e-7), rtol=1e-5)
    # identical masks -> 1
    ii = np.asarray(mask_iou(jnp.asarray(m1), jnp.asarray(m1)))
    np.testing.assert_allclose(np.diag(ii), 1.0, atol=1e-4)


def test_probiou_identity_and_symmetry():
    boxes = np.stack([rng.uniform(50, 200, 12), rng.uniform(50, 200, 12),
                      rng.uniform(10, 60, 12), rng.uniform(10, 60, 12),
                      rng.uniform(0, np.pi / 2, 12)], -1).astype(np.float32)
    same = np.asarray(probiou(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(same, 1.0, atol=2e-3)
    pair = np.asarray(batch_probiou(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(pair), 1.0, atol=2e-3)
    np.testing.assert_allclose(pair, pair.T, atol=1e-5)
    # axis-aligned probiou of disjoint boxes is low
    b1 = jnp.asarray([[50.0, 50, 20, 20, 0]])
    b2 = jnp.asarray([[300.0, 300, 20, 20, 0]])
    assert float(probiou(b1, b2)[0, 0]) < 0.05


def test_kpt_iou_perfect_match():
    k = rng.uniform(10, 90, size=(3, 17, 3)).astype(np.float32)
    k[..., 2] = 1.0
    area = np.full((3,), 900.0, dtype=np.float32)
    sigma = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72, .62,
                      .62, 1.07, 1.07, .87, .87, .89, .89], np.float32) / 10.0
    oks = np.asarray(kpt_iou(jnp.asarray(k), jnp.asarray(k),
                             jnp.asarray(area), jnp.asarray(sigma)))
    np.testing.assert_allclose(np.diag(oks), 1.0, atol=1e-5)


def _np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou = _np_box_iou(boxes[i:i + 1], boxes)[0]
        suppressed |= iou > thr
        suppressed[i] = True
    return keep


def test_nms_matches_numpy_greedy():
    n, nc = 400, 7
    boxes_xywh = np.concatenate([rng.uniform(40, 600, (n, 2)),
                                 rng.uniform(10, 80, (n, 2))], -1).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n, nc)).astype(np.float32)
    pred = np.concatenate([boxes_xywh, scores], -1).T[None]  # (1, 4+nc, N)

    out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                              iou_thres=0.45, max_det=100, nc=nc)
    got_n = int(out.valid.sum())
    got_boxes = np.asarray(out.boxes[0][:got_n])
    got_scores = np.asarray(out.scores[0][:got_n])
    got_cls = np.asarray(out.classes[0][:got_n])

    # numpy oracle: conf filter + class-offset greedy NMS
    conf = scores.max(-1)
    cls = scores.argmax(-1)
    m = conf > 0.25
    xyxy = np.asarray(xywh2xyxy(jnp.asarray(boxes_xywh)))[m]
    conf_f, cls_f = conf[m], cls[m]
    off = cls_f[:, None] * 7680.0
    keep = _np_greedy_nms(xyxy + off, conf_f, 0.45)
    keep = sorted(keep, key=lambda i: -conf_f[i])[:100]

    assert got_n == len(keep)
    np.testing.assert_allclose(got_scores, conf_f[keep], rtol=1e-5)
    np.testing.assert_allclose(got_boxes, xyxy[keep], rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(got_cls, cls_f[keep])
    # padding rows are zeroed
    np.testing.assert_allclose(np.asarray(out.scores[0][got_n:]), 0.0)


def test_nms_rotated_keep_mask():
    # two near-identical rotated boxes + one far away -> keep 2
    boxes = jnp.asarray([[100.0, 100, 40, 20, 0.3],
                         [101.0, 100, 40, 20, 0.31],
                         [300.0, 300, 40, 20, 1.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated(boxes, scores, 0.45))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_tiled_greedy_matches_matrix():
    # force the tile-sequential large-K path (matrix_k below K) and check
    # it agrees with the numpy greedy oracle bit-for-bit on selections
    n, nc = 1500, 5
    r = np.random.default_rng(42)
    boxes_xywh = np.concatenate([r.uniform(40, 600, (n, 2)),
                                 r.uniform(10, 80, (n, 2))], -1).astype(np.float32)
    scores = r.uniform(0, 1, size=(n, nc)).astype(np.float32)
    pred = np.concatenate([boxes_xywh, scores], -1).T[None]

    out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                              iou_thres=0.45, max_det=100, nc=nc,
                              matrix_k=256)  # K=1500 > 256 -> tiled path
    got_n = int(out.valid.sum())
    got_scores = np.asarray(out.scores[0][:got_n])
    got_boxes = np.asarray(out.boxes[0][:got_n])

    conf = scores.max(-1)
    cls = scores.argmax(-1)
    m = conf > 0.25
    xyxy = np.asarray(xywh2xyxy(jnp.asarray(boxes_xywh)))[m]
    conf_f, cls_f = conf[m], cls[m]
    keep = _np_greedy_nms(xyxy + cls_f[:, None] * 7680.0, conf_f, 0.45)
    keep = sorted(keep, key=lambda i: -conf_f[i])[:100]

    assert got_n == len(keep)
    np.testing.assert_allclose(got_scores, conf_f[keep], rtol=1e-5)
    np.testing.assert_allclose(got_boxes, xyxy[keep], rtol=1e-4, atol=1e-3)
    assert not bool(out.truncated[0])


def test_nms_truncated_flag():
    # many above-threshold candidates + tiny pre_topk -> truncated=True
    n, nc = 64, 3
    r = np.random.default_rng(1)
    boxes_xywh = np.concatenate([r.uniform(40, 600, (n, 2)),
                                 r.uniform(10, 80, (n, 2))], -1).astype(np.float32)
    scores = r.uniform(0.5, 1, size=(n, nc)).astype(np.float32)
    pred = np.concatenate([boxes_xywh, scores], -1).T[None]
    out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                              iou_thres=0.45, max_det=10, nc=nc, pre_topk=8)
    assert bool(out.truncated[0])
    out2 = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                               iou_thres=0.45, max_det=10, nc=nc)
    assert not bool(out2.truncated[0])
