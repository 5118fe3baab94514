"""Paired measurement: the s2d-packed TRAIN region on the m-size families.

Round 5 extends the packed-grid CSP rewrite to C3k-bearing C3k2 blocks
(nn/common.py _PackedC3k), making v11/v12 m/l/x eligible for
train_packed_depth=2 (they previously clamped to depth 1). This measures
the production train step — device-augment render fused into the step,
REAL coco128-seg / coco8-pose batches through YoloDataset.device_batch —
paired interleaved: depth 1 (the pre-r5 clamp) vs depth 2 (new), plus the
render-only control (depth 0).

Usage: python scripts/perf_family_packed.py [seg|pose] [pairs=3]
Env: YS_BATCH=8, YS_IMGSZ=640.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

ASSETS = "/root/reference/YoloSharpDemo/Assets/DataSets"
BATCH = int(os.environ.get("YS_BATCH", "8"))
IMGSZ = int(os.environ.get("YS_IMGSZ", "640"))
STEPS = 10


def build(which: str):
    from yolosharp_tpu.config import Config
    from yolosharp_tpu.data import YoloDataset
    from yolosharp_tpu.tasks import PoseDetector, Segmenter
    from yolosharp_tpu.train import TrainState, make_optimizer
    from yolosharp_tpu.types import (ImageProcessType, TaskType, YoloSize,
                                     YoloType)

    if which == "seg":
        cfg = Config(root_path=os.path.join(ASSETS, "coco128-seg"),
                     train_data_path="train.txt", val_data_path="val.txt",
                     task_type=TaskType.segment, yolo_type=YoloType.v11,
                     yolo_size=YoloSize.m, number_class=80,
                     image_size=IMGSZ, batch_size=BATCH, end2end=False,
                     image_process_type=ImageProcessType.mosaic)
        task = Segmenter(cfg)
    elif which == "pose":
        cfg = Config(root_path=os.path.join(ASSETS, "coco8-pose"),
                     train_data_path="images/train",
                     val_data_path="images/val",
                     task_type=TaskType.pose, yolo_type=YoloType.v11,
                     yolo_size=YoloSize.m, number_class=1,
                     keypoint_num=17, keypoint_dim=3,
                     image_size=IMGSZ, batch_size=BATCH, end2end=False,
                     image_process_type=ImageProcessType.mosaic)
        task = PoseDetector(cfg)
    else:
        raise SystemExit(f"unknown family {which!r}")

    ds = YoloDataset(cfg, is_val=False)
    idx = [i % len(ds.records) for i in range(BATCH)]
    batch = ds.device_batch(idx, max_labels=ds.max_label_count)
    batch = jax.device_put(batch)

    loss_fn, _ = task._loss_fns()
    variables = task._ensure_variables()
    tx = make_optimizer(nc=cfg.number_class, epochs=10, steps_per_epoch=8)
    state = TrainState.create(variables, tx)
    return task, cfg, state, batch, loss_fn


def make_step(task, cfg, loss_fn, depth: int):
    import jax.numpy as jnp

    from yolosharp_tpu.train import make_train_step

    return make_train_step(task.net, loss_fn, compute_dtype=jnp.bfloat16,
                           donate=False,
                           packed_stem=depth >= 0,
                           separable_render=True,
                           packed_depth=max(depth, 0))


def measure(step, state, batch, kw):
    st, loss, _ = step(state, batch, kw)      # compile + warm
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        st, loss, _ = step(st, batch, kw)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / STEPS


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "seg"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    task, cfg, state, batch, loss_fn = build(which)
    kw = {}

    steps = {d: make_step(task, cfg, loss_fn, d) for d in (0, 1, 2)}
    print(f"family={which} v11m-{IMGSZ} b{BATCH} "
          f"(production device-render step, paired interleaved)")
    for p in range(pairs):
        row = {}
        for d in (0, 1, 2):
            dt = measure(steps[d], state, batch, kw)
            row[d] = dt
        d1, d2 = row[1], row[2]
        print(f"pair {p}: depth0={row[0]*1e3:.2f} ms "
              f"depth1={d1*1e3:.2f} ms depth2={d2*1e3:.2f} ms "
              f"({BATCH/row[0]:.1f}/{BATCH/d1:.1f}/{BATCH/d2:.1f} img/s) "
              f"d2_vs_d1={(d1/d2-1)*100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
