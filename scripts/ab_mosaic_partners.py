"""A/B: batch-local (device-augment) vs dataset-wide (host-path) mosaic
partner sampling on the COCO128 recipe (VERDICT r2 missing #3).

The reference draws mosaic partners from the WHOLE dataset
(YoloDataset.cs:65); the default device-augment path draws from the
current batch/shard (data/device_augment.py:21-25) to avoid quadrupling
host->HBM image traffic. `Config.mosaic_partner_pool=E` restores
dataset-wide partners on the SAME device pixel path, so the clean A/B
holds everything constant except the partner distribution:
A = device path, pool 0 (batch-local); B = device path, pool 48
(majority dataset-wide at bs16). Same recipe, same epochs, same seed.
The measured mAP delta goes to BASELINE.md.

Usage: python scripts/ab_mosaic_partners.py [epochs=60] [imgsz=320]
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from yolosharp_tpu import YoloTask
from yolosharp_tpu.config import Config
from yolosharp_tpu.types import ImageProcessType, TaskType, YoloSize, YoloType

DATA = "/root/reference/YoloSharpDemo/Assets/DataSets/coco128"


def run(name: str, partner_pool: int, epochs: int, imgsz: int):
    out = f"/tmp/ab_{name}"
    cfg = Config(root_path=DATA, image_size=imgsz, batch_size=16,
                 epochs=epochs, workers=4,
                 task_type=TaskType.detect, yolo_type=YoloType.v8,
                 yolo_size=YoloSize.n, number_class=80, end2end=False,
                 image_process_type=ImageProcessType.mosaic,
                 close_mosaic=max(epochs - 10, 1),
                 device_augment=True, mosaic_partner_pool=partner_pool,
                 patience=10 ** 9, output_path=out)
    YoloTask(cfg).train()
    best = (0.0, 0.0, 0)
    with open(os.path.join(out, "log.csv")) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        m = float(r["metrics/mAP50-95(B)"])
        if m > best[0]:
            best = (m, float(r["metrics/mAP50(B)"]), int(r["Epoch"]))
    return best


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    a = run("batchlocal", 0, epochs, imgsz)
    b = run("datasetwide", 48, epochs, imgsz)
    print(f"A batch-local  (pool 0) : best mAP50-95={a[0]:.4f} "
          f"mAP50={a[1]:.4f} @ep{a[2]}")
    print(f"B dataset-wide (pool 48): best mAP50-95={b[0]:.4f} "
          f"mAP50={b[1]:.4f} @ep{b[2]}")
    print(f"delta (A-B) mAP50-95: {a[0] - b[0]:+.4f}")


if __name__ == "__main__":
    main()
