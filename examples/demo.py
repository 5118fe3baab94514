"""Demo: fine-tune YOLOv8n-OBB on the bundled DOTA subset, then predict and
draw rotated boxes — mirroring YoloSharpDemo/Program.cs:10-143.

Usage:
    python examples/demo.py [--assets /root/reference/YoloSharpDemo/Assets]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets",
                    default="/root/reference/YoloSharpDemo/Assets")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="result/demo")
    args = ap.parse_args()

    from yolosharp_tpu import Config, TaskType, YoloSize, YoloType, YoloTask

    cfg = Config(
        root_path=os.path.join(args.assets, "DataSets", "DOTAv1"),
        train_data_path="train.txt", val_data_path="val.txt",
        output_path=args.out,
        task_type=TaskType.obb, yolo_type=YoloType.v8,
        yolo_size=YoloSize.n, number_class=15, image_size=args.imgsz,
        batch_size=args.batch, epochs=args.epochs, end2end=False,
        patience=50)
    task = YoloTask(cfg)
    task.train()

    # predict one training image and draw the rotated boxes
    import cv2

    from yolosharp_tpu.data import get_img_files
    from yolosharp_tpu.ops.boxes import cxcywhr2xyxyxyxy

    img_path = get_img_files(os.path.join(cfg.root_path, "val.txt"))[0]
    image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
    results = task.image_predict(image, 0.25, 0.45)
    print(f"{len(results)} detections on {os.path.basename(img_path)}")

    draw = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
    for r in results:
        pts = cxcywhr2xyxyxyxy((r.center_x, r.center_y, r.width, r.height,
                                r.radian)).reshape(4, 2).astype(np.int32)
        cv2.polylines(draw, [pts], True, (0, 255, 0), 2)
        cv2.putText(draw, f"{r.class_id}:{r.score:.2f}",
                    tuple(pts[0]), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 255, 0), 1)
    out_img = os.path.join(cfg.output_path, "demo_prediction.jpg")
    cv2.imwrite(out_img, draw)
    print("Wrote", out_img)


if __name__ == "__main__":
    main()
