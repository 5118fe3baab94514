"""Dataset orchestration: per-index transform pipelines + fixed-shape batch
collation for the jitted train/eval steps.

Functional parity targets: Data/YoloDataset.cs:57-99 (transform composition,
CloseMosaic), Data/YoloDataLoader.cs:18-44 (collation — here to padded
static shapes instead of ragged concat), Data/ClassificationDataset.cs.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List

import numpy as np

from ..config import Config
from ..types import ImageProcessType, TaskType
from . import augment as A
from .labels import LabelRecord, load_labels


class YoloDataset:
    """Detection-family dataset with the reference's augment pipeline."""

    def __init__(self, config: Config, is_val: bool = False,
                 use_rectangle: bool = False, seed: int = 0):
        self.config = config
        self.is_val = is_val
        self.task = config.task_type
        self.records = load_labels(config, is_val=is_val,
                                   use_rectangle=use_rectangle)
        self.rng = np.random.default_rng(seed)
        self.mosaic_closed = False

    def __len__(self) -> int:
        return len(self.records)

    @property
    def max_label_count(self) -> int:
        base = max((len(r.cls) for r in self.records), default=1)
        mult = (4 if (not self.is_val and not self.mosaic_closed
                      and self.config.image_process_type
                      == ImageProcessType.mosaic) else 1)
        n = max(base * mult, 8)
        return int(math.ceil(n / 8) * 8)

    def close_mosaic(self, closed: bool = True) -> None:
        self.mosaic_closed = closed

    def get(self, index: int) -> LabelRecord:
        cfg = self.config
        rec = self.records[index].copy()
        if self.is_val:
            return A.rectangle(rec, cfg.mask_ratio)

        use_mosaic = (cfg.image_process_type == ImageProcessType.mosaic
                      and not self.mosaic_closed)
        if use_mosaic and self.rng.uniform() <= cfg.mosaic:
            picks = [self.records[int(i)] for i in
                     self.rng.integers(0, len(self.records) - 1, 3)]
            rec = A.mosaic4(rec, picks, cfg.image_size, self.rng)
            rec = A.random_perspective(rec, cfg.degrees, cfg.translate,
                                       cfg.scale, cfg.shear, cfg.perspective,
                                       self.rng)
        else:
            rec = A.letterbox(rec, cfg.image_size, cfg.image_size,
                              cfg.mask_ratio)
        if cfg.flip_lr > 0 and self.rng.uniform() <= cfg.flip_lr:
            rec = A.flip_lr(rec)
        if cfg.flip_ud > 0 and self.rng.uniform() <= cfg.flip_ud:
            rec = A.flip_ud(rec)
        rec = A.random_hsv(rec, cfg.hsv_h, cfg.hsv_s, cfg.hsv_v, self.rng)
        return rec

    def collate(self, recs: List[LabelRecord], max_labels: int
                ) -> Dict[str, np.ndarray]:
        """Stack transformed records into one padded batch dict."""
        cfg = self.config
        # pad to the batch max (bottom/right, gray) if shapes differ — keeps
        # label pixel coords valid since all transforms pad top-left-anchored
        h = max(r.img.shape[0] for r in recs)
        w = max(r.img.shape[1] for r in recs)

        def pad_to(img, th, tw, fill):
            if img.shape[0] == th and img.shape[1] == tw:
                return img
            out = np.full((th, tw) + img.shape[2:], fill, img.dtype)
            out[:img.shape[0], :img.shape[1]] = img
            return out

        # images stay uint8: 4x less host->device traffic; the jitted step
        # normalizes on device (reference moves fp tensors, YoloDataset.cs:140)
        images = np.stack([pad_to(r.img, h, w, 114) for r in recs])
        out = {"images": images}
        out.update(self._label_arrays(recs, max_labels, h, w))

        if self.task == TaskType.segment:
            mh, mw = h // cfg.mask_ratio, w // cfg.mask_ratio
            out["masks"] = np.stack([
                pad_to(r.mask, mh, mw, 0) if r.mask is not None else
                np.zeros((mh, mw), np.uint8)
                for r in recs]).astype(np.float32)
        return out

    def use_device_augment(self) -> bool:
        """True when this dataset's train batches should be planned on the
        host and rendered on device (data/device_augment.py)."""
        cfg = self.config
        return (bool(getattr(cfg, "device_augment", False))
                and not self.is_val and not self.mosaic_closed
                and cfg.image_process_type == ImageProcessType.mosaic
                and cfg.mosaic >= 1.0)

    def device_batch(self, idx, max_labels: int, partner_group: int = 0
                     ) -> Dict[str, np.ndarray]:
        """Plan a device-augmented batch: label math on host, pixels as
        plan arrays + a uint8 source pool for the jitted train step.

        partner_group > 0 restricts mosaic partners to groups of that size
        (so each sample's 4 tiles stay within one data-parallel shard).
        """
        from . import device_augment as DA

        cfg = self.config
        recs = [self.records[int(i)] for i in idx]
        b = len(recs)
        extras = int(getattr(cfg, "mosaic_partner_pool", 0) or 0)
        if extras > 0:
            # dataset-wide partners (YoloDataset.cs:65): append E extra
            # images per shard group in block layout (device_augment.py
            # plan_mosaic_batch docstring)
            gs = partner_group if partner_group and partner_group > 0 else b
            if b % gs:
                gs = b
            pool_recs = []
            for g in range(b // gs):
                pool_recs += recs[g * gs:(g + 1) * gs]
                ex = self.rng.integers(0, len(self.records), extras)
                pool_recs += [self.records[int(t)] for t in ex]
            plan, labels = DA.plan_mosaic_batch(
                pool_recs, cfg, self.rng, group=gs,
                extras_per_group=extras)
        else:
            pool_recs = recs
            plan, labels = DA.plan_mosaic_batch(recs, cfg, self.rng,
                                                group=partner_group)
        s = cfg.image_size
        pool = np.full((len(pool_recs), s, s, 3), 114, np.uint8)
        for k, r in enumerate(pool_recs):
            h, w = r.resized_shape
            pool[k, :h, :w] = r.img
        out = self._label_arrays(labels, max_labels, s, s)
        out.update(aug_pool=pool, aug_src_idx=plan.src_idx,
                   aug_rects=plan.rects, aug_pads=plan.pads,
                   aug_minv=plan.minv, aug_persp=plan.persp,
                   aug_flips=plan.flips, aug_hsv=plan.hsv)
        if self.task == TaskType.segment:
            sm = s // cfg.mask_ratio
            mpool = np.zeros((len(pool_recs), sm, sm), np.uint8)
            for k, r in enumerate(pool_recs):
                if r.mask is not None:
                    mh, mw = r.mask.shape[:2]
                    mpool[k, :min(mh, sm), :min(mw, sm)] = \
                        r.mask[:sm, :sm]
            out["aug_mask_pool"] = mpool
            out["aug_mask_lut"] = plan.mask_lut
        return out

    def _label_arrays(self, recs: List[LabelRecord], max_labels: int,
                      h: int, w: int) -> Dict[str, np.ndarray]:
        """Padded/normalized label tensors for a batch (canvas h x w)."""
        cfg = self.config
        b = len(recs)
        nbox = 5 if self.task == TaskType.obb else 4
        cls = np.zeros((b, max_labels), np.int32)
        bboxes = np.zeros((b, max_labels, nbox), np.float32)
        mask_gt = np.zeros((b, max_labels), bool)
        out = {"cls": cls, "bboxes": bboxes, "mask_gt": mask_gt}
        if self.task == TaskType.pose:
            out["keypoints"] = np.zeros(
                (b, max_labels, cfg.keypoint_num, cfg.keypoint_dim),
                np.float32)

        for i, r in enumerate(recs):
            n = min(len(r.cls), max_labels)
            if n == 0:
                continue
            cls[i, :n] = r.cls[:n].astype(np.int32)
            mask_gt[i, :n] = True
            if self.task == TaskType.obb:
                from ..ops.boxes import xyxyxyxy2xywhr

                xywhr = xyxyxyxy2xywhr(r.obb_corners[:n])
                xywhr[:, 0] /= w
                xywhr[:, 1] /= h
                xywhr[:, 2] /= w
                xywhr[:, 3] /= h
                bboxes[i, :n] = xywhr
            else:
                bb = r.bboxes[:n]
                cxy = (bb[:, :2] + bb[:, 2:]) / 2
                wh = bb[:, 2:] - bb[:, :2]
                bboxes[i, :n, :2] = cxy / [w, h]
                bboxes[i, :n, 2:4] = wh / [w, h]
            if self.task == TaskType.pose and r.keypoints is not None:
                k = r.keypoints[:n].copy()
                k[..., 0] /= w
                k[..., 1] /= h
                out["keypoints"][i, :n] = k
        return out


class ClassificationDataset:
    """Folder-per-class classification dataset (ClassificationDataset.cs)."""

    def __init__(self, config: Config, is_val: bool = False, seed: int = 0):
        self.config = config
        self.is_val = is_val
        from .labels import get_img_files

        split = config.val_data_path if is_val else config.train_data_path
        root = os.path.abspath(os.path.join(config.root_path, split))
        if not os.path.isdir(root) and not os.path.isfile(root):
            # quiet fallback here would make train and val the SAME data;
            # surface it (the reference errors on the missing split dir,
            # ClassificationDataset.cs:45-68 via BaseDataset file scan)
            print(f"WARNING: classification split '{split}' not found under "
                  f"{config.root_path}; falling back to the root folder — "
                  f"train and val will see identical data.")
            root = os.path.abspath(config.root_path)
        files = get_img_files(root)
        # class name = parent directory name (folder-per-class convention)
        self.classes = sorted({os.path.basename(os.path.dirname(p))
                               for p in files})
        cindex = {c: i for i, c in enumerate(self.classes)}
        self.samples = [(p, cindex[os.path.basename(os.path.dirname(p))])
                        for p in files]
        if not self.samples:
            raise FileNotFoundError(f"no classification data in {root}")
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.samples)

    def close_mosaic(self, closed: bool = True) -> None:
        pass

    @property
    def max_label_count(self) -> int:
        return 1

    def get(self, index: int) -> Dict[str, np.ndarray]:
        import cv2

        cfg = self.config
        path, ci = self.samples[index]
        img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        s = cfg.image_size
        if self.is_val:
            # resize short side then center crop
            h, w = img.shape[:2]
            r = s / min(h, w)
            img = cv2.resize(img, (max(s, int(w * r)), max(s, int(h * r))))
            h, w = img.shape[:2]
            top, left = (h - s) // 2, (w - s) // 2
            img = img[top:top + s, left:left + s]
        else:
            # RandomResizedCrop (ClassificationDataset.cs:90-131)
            h, w = img.shape[:2]
            area = h * w
            for _ in range(10):
                ta = area * self.rng.uniform(cfg.classify_scale_min,
                                             cfg.classify_scale_max)
                ar = math.exp(self.rng.uniform(
                    math.log(cfg.classify_ratio_min),
                    math.log(cfg.classify_ratio_max)))
                cw = int(round(math.sqrt(ta * ar)))
                chh = int(round(math.sqrt(ta / ar)))
                if 0 < cw <= w and 0 < chh <= h:
                    left = int(self.rng.integers(0, w - cw + 1))
                    top = int(self.rng.integers(0, h - chh + 1))
                    img = img[top:top + chh, left:left + cw]
                    break
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
            if cfg.flip_lr > 0 and self.rng.uniform() < cfg.flip_lr:
                img = np.ascontiguousarray(img[:, ::-1])
            if cfg.flip_ud > 0 and self.rng.uniform() < cfg.flip_ud:
                img = np.ascontiguousarray(img[::-1])

            from . import classify_augment as CA

            aat = cfg.auto_augment
            if aat.value == "autoaugment":
                img = CA.auto_augment(img, self.rng)
            elif aat.value == "randaugment":
                img = CA.rand_augment(img, self.rng)
            elif aat.value == "augmix":
                img = CA.augmix(img, self.rng)
            if cfg.erasing > 0:
                img = CA.random_erasing(img, self.rng, p=cfg.erasing)
        return {"image": np.ascontiguousarray(img), "cls": ci}

    def collate(self, items, max_labels: int) -> Dict[str, np.ndarray]:
        images = np.stack([it["image"] for it in items])
        cls = np.asarray([it["cls"] for it in items], np.int32)
        return {"images": images, "cls": cls}
