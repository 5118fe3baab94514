"""Data pipeline tests against the reference's bundled fixture datasets."""

import os

import numpy as np
import pytest

from yolosharp_tpu.config import Config
from yolosharp_tpu.data import DataLoader, YoloDataset
from yolosharp_tpu.types import ImageProcessType, TaskType

ASSETS = "/root/reference/YoloSharpDemo/Assets/DataSets"
needs_assets = pytest.mark.skipif(not os.path.isdir(ASSETS),
                                  reason="reference datasets not mounted")


def _cfg(**kw):
    base = dict(root_path=os.path.join(ASSETS, "coco128"),
                train_data_path="train.txt", val_data_path="val.txt",
                image_size=320, batch_size=4, number_class=80)
    base.update(kw)
    return Config(**base)


@needs_assets
def test_scan_and_parse_coco128():
    cfg = _cfg()
    ds = YoloDataset(cfg, is_val=False)
    assert len(ds) > 100
    rec = ds.records[0]
    assert rec.img.dtype == np.uint8
    assert max(rec.resized_shape) <= 320
    assert rec.bboxes.shape[1] == 4
    # boxes within image bounds
    for r in ds.records[:20]:
        if len(r.bboxes):
            h, w = r.resized_shape
            assert r.bboxes[:, 0].min() >= -1 and r.bboxes[:, 2].max() <= w + 1
            assert r.bboxes[:, 1].min() >= -1 and r.bboxes[:, 3].max() <= h + 1


@needs_assets
def test_train_batch_shapes_mosaic():
    # host-collate contract (device_augment batches are plan dicts rendered
    # by the jitted step; covered in test_device_augment.py)
    cfg = _cfg(device_augment=False)
    ds = YoloDataset(cfg, is_val=False)
    dl = DataLoader(ds, batch_size=4, workers=2, seed=0)
    batch = next(iter(dl))
    assert batch["images"].shape == (4, 320, 320, 3)
    # uint8 on the wire; the jitted step normalizes on device
    assert batch["images"].dtype == np.uint8
    m = dl.max_labels
    assert batch["cls"].shape == (4, m)
    assert batch["bboxes"].shape == (4, m, 4)
    assert batch["mask_gt"].any()
    # normalized boxes
    valid = batch["bboxes"][batch["mask_gt"]]
    assert valid.min() >= 0.0 and valid.max() <= 1.0


@needs_assets
def test_val_batch_rectangle():
    cfg = _cfg()
    ds = YoloDataset(cfg, is_val=True)
    dl = DataLoader(ds, batch_size=4, shuffle=False, workers=2)
    batch = next(iter(dl))
    b, h, w, c = batch["images"].shape
    assert b == 4 and c == 3
    assert h % 32 == 0 and w % 32 == 0


@needs_assets
def test_letterbox_pipeline():
    cfg = _cfg(image_process_type=ImageProcessType.letterbox)
    ds = YoloDataset(cfg, is_val=False)
    rec = ds.get(0)
    assert rec.img.shape == (320, 320, 3)


@needs_assets
def test_segmentation_masks():
    cfg = _cfg(root_path=os.path.join(ASSETS, "coco128-seg"),
               task_type=TaskType.segment, device_augment=False)
    ds = YoloDataset(cfg, is_val=False)
    rec = ds.records[0]
    assert rec.mask is not None
    assert rec.mask.max() >= 1  # overlap-encoded instance ids
    dl = DataLoader(ds, batch_size=2, workers=2)
    batch = next(iter(dl))
    assert batch["masks"].shape == (2, 80, 80)  # 320/4 after mosaic+warp


@needs_assets
def test_obb_dota():
    cfg = _cfg(root_path=os.path.join(ASSETS, "DOTAv1"), number_class=15,
               task_type=TaskType.obb)
    ds = YoloDataset(cfg, is_val=False)
    assert any(r.obb_corners is not None and len(r.obb_corners)
               for r in ds.records)
    dl = DataLoader(ds, batch_size=2, workers=2)
    batch = next(iter(dl))
    assert batch["bboxes"].shape[-1] == 5
    valid = batch["bboxes"][batch["mask_gt"]]
    if len(valid):
        assert valid[:, :4].min() >= -0.01 and valid[:, :4].max() <= 1.01


@needs_assets
def test_pose_coco8():
    cfg = _cfg(root_path=os.path.join(ASSETS, "coco8-pose"), number_class=1,
               train_data_path="images/train2017",
               val_data_path="images/train2017", task_type=TaskType.pose)
    ds = YoloDataset(cfg, is_val=False)
    dl = DataLoader(ds, batch_size=2, workers=2)
    batch = next(iter(dl))
    assert batch["keypoints"].shape[2:] == (17, 3)
    kp = batch["keypoints"][batch["mask_gt"]]
    if len(kp):
        vis = kp[..., 2] > 0
        assert kp[..., 0][vis].max() <= 1.01


@needs_assets
def test_classification_flowers():
    from yolosharp_tpu.data import ClassificationDataset

    cfg = _cfg(root_path=os.path.join(ASSETS, "flowers"),
               train_data_path="train", val_data_path="val",
               task_type=TaskType.classify, image_size=224)
    ds = ClassificationDataset(cfg, is_val=False)
    assert len(ds.classes) >= 2
    dl = DataLoader(ds, batch_size=4, workers=2)
    batch = next(iter(dl))
    assert batch["images"].shape == (4, 224, 224, 3)
    assert batch["cls"].shape == (4,)


@needs_assets
def test_close_mosaic_switch():
    cfg = _cfg()
    ds = YoloDataset(cfg, is_val=False)
    ds.close_mosaic(True)
    rec = ds.get(0)
    assert rec.img.shape == (320, 320, 3)


def test_bucket_shapes_quantizes_to_max():
    """An arbitrary-size val set must compile O(buckets) eval programs:
    100 mixed-aspect batch shapes quantize to <= 4 dominating shapes with
    minimum batch-weighted padded area (Config.val_shape_buckets)."""
    from yolosharp_tpu.data.labels import bucket_shapes

    rng = np.random.default_rng(0)
    # aspect-sorted synthetic per-batch shapes (as parse produces them)
    aspects = np.sort(rng.uniform(0.5, 2.0, 100))
    shapes = []
    for a in aspects:
        h = int(round(320 * min(1, a) / 32)) * 32
        w = int(round(320 * min(1, 1 / a) / 32)) * 32
        shapes.append((max(h, 32), max(w, 32)))
    out = bucket_shapes(shapes, 4)
    assert len(out) == len(shapes)
    assert len(set(out)) <= 4
    for (h, w), (bh, bw) in zip(shapes, out):
        assert bh >= h and bw >= w          # every image still fits

    # identity when the set is already small
    small = [(320, 256)] * 3 + [(320, 320)] * 2
    assert bucket_shapes(small, 4) == small
    # 0 disables (exact reference behavior)
    assert bucket_shapes(shapes, 0) == shapes


def test_val_shape_buckets_end_to_end(tmp_path):
    """Synthetic 100-image mixed-aspect val set -> <= 4 distinct
    rectangle shapes through the real parse path, and each image's
    resized shape fits inside its assigned bucket."""
    import cv2

    from yolosharp_tpu.data.labels import load_labels

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "images" / "val"
    lab_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    for i in range(100):
        h = int(rng.integers(80, 640))
        w = int(rng.integers(80, 640))
        im = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"im{i:03d}.jpg"), im)
        (lab_dir / f"im{i:03d}.txt").write_text("0 0.5 0.5 0.2 0.2\n")

    cfg = Config(root_path=str(tmp_path), val_data_path="images/val",
                 image_size=320, batch_size=8, number_class=1)
    recs = load_labels(cfg, is_val=True)
    shapes = {r.rectangle_shape for r in recs}
    assert len(shapes) <= 4, shapes
    for r in recs:
        rh, rw = r.resized_shape
        bh, bw = r.rectangle_shape
        assert bh >= rh and bw >= rw

    # exact per-batch shapes when disabled (one shape per batch max)
    cfg0 = Config(root_path=str(tmp_path), val_data_path="images/val",
                  image_size=320, batch_size=8, number_class=1,
                  val_shape_buckets=0)
    recs0 = load_labels(cfg0, is_val=True)
    shapes0 = {r.rectangle_shape for r in recs0}
    assert len(shapes0) > 4      # this set genuinely has many shapes
