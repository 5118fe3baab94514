import numpy as np
import jax.numpy as jnp
import pytest

from yolosharp_tpu.ops import (
    bbox2dist, clip_boxes, clip_keypoints, dist2bbox, dist2rbox, dfl_decode,
    make_anchors, rbox2dist, xywh2xyxy, xywhn2xyxy, xywhr2xyxyxyxy,
    xyxy2xywh, xyxy2xywhn, xyxyxyxy2xywhr)

rng = np.random.default_rng(0)


def test_xywh_xyxy_roundtrip():
    x = rng.uniform(10, 100, size=(32, 4)).astype(np.float32)
    x[:, 2:] = np.abs(x[:, 2:])
    y = xyxy2xywh(xywh2xyxy(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_values():
    out = np.asarray(xywh2xyxy(jnp.asarray([[10.0, 20.0, 4.0, 6.0]])))
    np.testing.assert_allclose(out, [[8, 17, 12, 23]])


def test_normalized_conversions():
    x = rng.uniform(0.2, 0.6, size=(8, 4)).astype(np.float32)
    abs_boxes = xywhn2xyxy(jnp.asarray(x), w=320, h=240)
    back = xyxy2xywhn(abs_boxes, w=320, h=240)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-5)


def test_clip_boxes():
    x = jnp.asarray([[-5.0, -5.0, 700.0, 700.0]])
    out = np.asarray(clip_boxes(x, (480, 640)))
    np.testing.assert_allclose(out, [[0, 0, 640, 480]])


def test_clip_keypoints_zeroes_visibility():
    k = jnp.asarray([[[-10.0, 5.0, 1.0], [5.0, 5.0, 1.0]]])
    out = np.asarray(clip_keypoints(k, (100, 100)))
    assert out[0, 0, 2] == 0.0 and out[0, 1, 2] == 1.0
    assert out[0, 0, 0] == 0.0


def test_xywhr_corner_roundtrip():
    # random rotated boxes; corner conversion then minAreaRect recovers
    # center exactly and (w, h) as an unordered pair
    boxes = np.stack([
        rng.uniform(50, 200, 16), rng.uniform(50, 200, 16),
        rng.uniform(10, 80, 16), rng.uniform(10, 80, 16),
        rng.uniform(0.05, np.pi / 2 - 0.05, 16)], axis=-1).astype(np.float32)
    corners = np.asarray(xywhr2xyxyxyxy(jnp.asarray(boxes)))
    assert corners.shape == (16, 4, 2)
    rec = xyxyxyxy2xywhr(corners)
    np.testing.assert_allclose(rec[:, :2], boxes[:, :2], atol=1e-2)
    got_wh = np.sort(rec[:, 2:4], axis=1)
    want_wh = np.sort(boxes[:, 2:4], axis=1)
    np.testing.assert_allclose(got_wh, want_wh, atol=0.05)


def test_make_anchors():
    pts, strides = make_anchors([(80, 80), (40, 40), (20, 20)], [8, 16, 32])
    assert pts.shape == (8400, 2)
    assert strides.shape == (8400, 1)
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(pts[1]), [1.5, 0.5])
    np.testing.assert_allclose(np.asarray(strides[:6400]), 8.0)
    np.testing.assert_allclose(np.asarray(strides[-400:]), 32.0)


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = rng.uniform(5, 75, size=(64, 2)).astype(np.float32)
    dist = rng.uniform(0.1, 4.0, size=(64, 4)).astype(np.float32)
    boxes = dist2bbox(jnp.asarray(dist), jnp.asarray(anchors), xywh=False)
    back = bbox2dist(jnp.asarray(anchors), boxes)
    np.testing.assert_allclose(np.asarray(back), dist, rtol=1e-5, atol=1e-5)


def test_dist2rbox_rbox2dist_roundtrip():
    anchors = rng.uniform(5, 75, size=(64, 2)).astype(np.float32)
    angle = rng.uniform(-0.7, 2.3, size=(64, 1)).astype(np.float32)
    dist = rng.uniform(0.1, 4.0, size=(64, 4)).astype(np.float32)
    rbox = dist2rbox(jnp.asarray(dist), jnp.asarray(angle), jnp.asarray(anchors))
    back = rbox2dist(rbox, jnp.asarray(anchors), jnp.asarray(angle))
    np.testing.assert_allclose(np.asarray(back), dist, rtol=1e-4, atol=1e-4)


def test_dfl_decode_matches_expectation_oracle():
    logits = rng.normal(size=(2, 13, 64)).astype(np.float32)
    out = np.asarray(dfl_decode(jnp.asarray(logits), reg_max=16))
    # independent numpy oracle: softmax expectation per 16-bin group
    x = logits.reshape(2, 13, 4, 16)
    e = np.exp(x - x.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = (p * np.arange(16)).sum(-1)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    assert out.min() >= 0 and out.max() <= 15
