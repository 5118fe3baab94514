"""batch_predict across every task family must match image_predict
per image (same canvas shape -> identical jitted program inputs).

The reference predicts strictly one image per call for all tasks
(Detector.cs:27-72, Segmenter.cs:45, Obber.cs, PoseDetector.cs,
Classifier.cs); batch_predict is the TPU-native serving extension and
must be result-invisible relative to the per-image path.
"""

import cv2
import numpy as np
import pytest

from util_calib import calibrate_task

from yolosharp_tpu.config import Config
from yolosharp_tpu.tasks import (Classifier, Obber, PoseDetector,
                                 Segmenter)
from yolosharp_tpu.types import TaskType, YoloSize, YoloType

BUS = "/root/reference/YoloSharpDemo/Assets/TestImage/bus.jpg"


def _imgs(size=128):
    img = cv2.resize(cv2.imread(BUS), (size, size))
    return [img, img[:, ::-1].copy()]


def _cfg(task_type, **kw):
    # host_s2d=True: the batched path runs host-packed s2d while
    # image_predict stays raw — every comparison below also asserts the
    # packed-stem program is result-identical to the unpacked one
    return Config(task_type=task_type, yolo_type=YoloType.v8,
                  yolo_size=YoloSize.n, number_class=kw.pop("nc", 80),
                  end2end=False, image_size=128, host_s2d=True, **kw)


def _assert_match(singles, batched, check_extra=None):
    assert len(batched) == len(singles)
    assert sum(len(s) for s in singles) > 0, "no detections — test is vacuous"
    for s_list, b_list in zip(singles, batched):
        assert len(s_list) == len(b_list)
        for s, b in zip(s_list, b_list):
            assert s.class_id == b.class_id
            assert abs(s.score - b.score) < 1e-3
            assert abs(s.center_x - b.center_x) <= 1
            assert abs(s.center_y - b.center_y) <= 1
            assert abs(s.width - b.width) <= 2
            assert abs(s.height - b.height) <= 2
            if check_extra:
                check_extra(s, b)


def test_segment_batch_predict_matches_image_predict():
    seg = calibrate_task(Segmenter(_cfg(TaskType.segment)))
    imgs = _imgs()
    singles = [seg.image_predict(im, 0.5, 0.45) for im in imgs]
    batched = seg.batch_predict(imgs, 0.5, 0.45)

    def masks_match(s, b):
        assert s.mask is not None and b.mask is not None
        assert s.mask.shape == b.mask.shape
        agree = (s.mask > 0.5) == (b.mask > 0.5)
        assert agree.mean() > 0.99

    _assert_match(singles, batched, masks_match)


def test_obb_batch_predict_matches_image_predict():
    obb = calibrate_task(Obber(_cfg(TaskType.obb, nc=15)))
    imgs = _imgs()
    singles = [obb.image_predict(im, 0.5, 0.45) for im in imgs]
    batched = obb.batch_predict(imgs, 0.5, 0.45)

    def radian_match(s, b):
        assert abs(s.radian - b.radian) < 1e-3

    _assert_match(singles, batched, radian_match)


def test_pose_batch_predict_matches_image_predict():
    pose = calibrate_task(PoseDetector(_cfg(TaskType.pose, nc=1)))
    imgs = _imgs()
    singles = [pose.image_predict(im, 0.5, 0.45) for im in imgs]
    batched = pose.batch_predict(imgs, 0.5, 0.45)

    def kpts_match(s, b):
        assert len(s.keypoints) == len(b.keypoints) == 17
        for sk, bk in zip(s.keypoints, b.keypoints):
            assert abs(sk.x - bk.x) < 0.5 and abs(sk.y - bk.y) < 0.5
            assert abs(sk.visibility - bk.visibility) < 1e-3

    _assert_match(singles, batched, kpts_match)


def test_classify_batch_predict_matches_image_predict():
    clf = Classifier(_cfg(TaskType.classify, nc=5))
    imgs = _imgs(64)
    singles = [clf.image_predict(im) for im in imgs]
    batched = clf.batch_predict(imgs)
    assert len(batched) == 2
    for s_list, b_list in zip(singles, batched):
        assert [r.class_id for r in s_list] == [r.class_id for r in b_list]
        for s, b in zip(s_list, b_list):
            assert abs(s.score - b.score) < 1e-5
