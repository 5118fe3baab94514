"""Demo: TPU-native serving — batched, streaming, and data-parallel
inference through the `YoloTask` facade.

The reference predicts one image per call with host NMS
(Models/Detector.cs:27-72); this framework adds three serving shapes the
per-image API cannot express:

  1. `batch_predict`  — N images, ONE device program (single dispatch).
  2. `predict_stream` — a generator over an image iterable: host
     LetterBox worker pool + transfer thread + depth-2 device pipeline;
     steady-state throughput = max(host, transfer, device) instead of
     their sum. Results come back in ORIGINAL image coordinates.
  3. `mesh=`          — the same programs run data-parallel over every
     chip of a `jax.sharding.Mesh` (batch rows sharded on the data
     axis, parameters replicated, XLA inserts the collectives).

On hosts with spare cores the serving paths also host-pack the input
2x2 space-to-depth (`Config.host_s2d`) so the stem runs as the exact
stride-1 repacked conv — see BASELINE.md for the measured effects.

Usage:
    python examples/serve.py [--weights Yolov8n.bin] [--images dir_or_file]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images",
                    default="/root/reference/YoloSharpDemo/Assets/TestImage")
    ap.add_argument("--weights", default=None,
                    help="optional .bin/.pt/.safetensors checkpoint")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch over all visible devices")
    args = ap.parse_args()

    from yolosharp_tpu import Config, TaskType, YoloSize, YoloType, YoloTask

    paths = ([args.images] if os.path.isfile(args.images) else
             sorted(glob.glob(os.path.join(args.images, "*.jpg"))
                    + glob.glob(os.path.join(args.images, "*.png"))))
    if not paths:
        raise SystemExit(f"no images under {args.images}")
    frames = [cv2.imread(p) for p in paths]
    # recycle the frames into a longer stream so the pipeline fills
    stream = [frames[i % len(frames)] for i in range(4 * args.batch)]

    task = YoloTask(Config(
        task_type=TaskType.detect, yolo_type=YoloType.v8,
        yolo_size=YoloSize.n, number_class=80, end2end=False,
        image_size=args.imgsz))
    if args.weights:
        task.load_model(args.weights, skip_nc_not_equal_layers=True)

    mesh = None
    if args.mesh:
        from yolosharp_tpu.parallel import create_mesh

        mesh = create_mesh()
        print(f"data-parallel mesh over {mesh.devices.size} device(s)")

    # 1) batched: one device program for the whole list
    t0 = time.perf_counter()
    results = task.batch_predict(frames, 0.25, 0.45, mesh=mesh)
    dt = time.perf_counter() - t0
    for p, rows in zip(paths, results):
        print(f"batch_predict {os.path.basename(p)}: {len(rows)} boxes")
    print(f"batch_predict: {len(frames)} images in {dt*1e3:.1f} ms "
          f"(incl. first-call compile)")

    # 2) streaming: pipelined generator, original-coordinate results
    t0 = time.perf_counter()
    n_img, n_box = 0, 0
    for rows in task.predict_stream(iter(stream), batch_size=args.batch,
                                    imgsz=args.imgsz, mesh=mesh,
                                    predict_threshold=0.25,
                                    iou_threshold=0.45):
        n_img += 1
        n_box += len(rows)
    dt = time.perf_counter() - t0
    print(f"predict_stream: {n_img} images, {n_box} boxes, "
          f"{n_img/dt:.1f} img/s steady-state (host+transfer+device "
          f"pipelined)")


if __name__ == "__main__":
    main()
