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
