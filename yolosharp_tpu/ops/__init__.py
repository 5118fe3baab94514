from .anchors import (bbox2dist, dfl_decode, dist2bbox, dist2rbox,
                      make_anchors, rbox2dist)
from .boxes import (clip_boxes, clip_keypoints, clip_obb_corners,
                    xywh2xyxy, xywhn2xyxy, xywhr2xyxyxyxy, xyxy2xywh,
                    xyxy2xywhn, xyxyxyxy2xywhr)
from .iou import (batch_probiou, bbox_iou, box_iou, kpt_iou, mask_iou,
                  probiou)
from .masks import crop_mask, process_mask
from .nms import NMSOutput, nms_rotated, non_max_suppression

__all__ = [
    "bbox2dist", "dfl_decode", "dist2bbox", "dist2rbox", "make_anchors",
    "rbox2dist", "clip_boxes", "clip_keypoints", "clip_obb_corners",
    "xywh2xyxy", "xywhn2xyxy", "xywhr2xyxyxyxy", "xyxy2xywh", "xyxy2xywhn",
    "xyxyxyxy2xywhr", "batch_probiou", "bbox_iou", "box_iou", "kpt_iou",
    "mask_iou", "probiou", "crop_mask", "process_mask", "NMSOutput",
    "nms_rotated", "non_max_suppression",
]
