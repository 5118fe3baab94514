"""BASELINE config #3 at the reference protocol: COCO128 fine-tune at 640px
from the bundled pretrained weights.

The only real pretrained checkpoint in this container is the reference's
Yolov5n.bin (anchor-BASED v5 head, model.24.m.*). Our v5u model loads its
backbone+neck (layers 0..23) and re-initializes the anchor-free head with
the reference's skipNcNotEqualLayers semantics + bias_init
(YoloBaseTaskModel.cs:41-113) — exactly what the reference does when head
shapes mismatch. Mosaic+HSV recipe, bf16, warm-up LR, val every epoch.

Usage: python scripts/finetune_coco128_640.py [epochs] [imgsz] [resume_npz]
Writes results to /tmp/ft640/; mAP numbers land in log.csv.  Passing a
last_state.npz as the third argument continues a truncated run through the
public facade resume (epoch counter, optimizer state, and loss-scale state
all restored), extending it to the full [epochs] protocol with the
close-mosaic tail — the reference's 300-epoch trainer protocol
(YoloBaseTaskModel.cs:116-289) with mosaic closed for the final 30 epochs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from yolosharp_tpu import YoloTask
from yolosharp_tpu.config import Config
from yolosharp_tpu.types import ImageProcessType, TaskType, YoloSize, YoloType

BIN = "/root/reference/YoloSharpDemo/Assets/PreTrainedModels/Yolov5n.bin"
DATA = "/root/reference/YoloSharpDemo/Assets/DataSets/coco128"


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    resume = sys.argv[3] if len(sys.argv) > 3 else None
    close_tail = 30 if epochs >= 300 else 10
    cfg = Config(root_path=DATA, image_size=imgsz, batch_size=16,
                 epochs=epochs, workers=4,
                 task_type=TaskType.detect, yolo_type=YoloType.v5u,
                 yolo_size=YoloSize.n, number_class=80, end2end=False,
                 image_process_type=ImageProcessType.mosaic,
                 close_mosaic=max(epochs - close_tail, 1),
                 patience=10 ** 9,  # fixed-budget run
                 output_path="/tmp/ft640")
    task = YoloTask(cfg)
    report = task.load_model(BIN, skip_nc_not_equal_layers=True)
    print("pretrained load:", report)
    task.train(resume_from=resume)


if __name__ == "__main__":
    main()
