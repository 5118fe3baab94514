"""Paired measurement: host-batch s2d packing on the w4 programs.

Same lever as perf_obb_packed.py (host batches pack via one in-graph
uint8 space_to_depth2, buying the packed train region incl. the m-size
_PackedC3k blocks) measured on the exact BASELINE workload-4 programs:
YOLOv11m-seg and YOLOv11m-pose 640 train steps, batch 8, bf16, host
images (scripts/bench_workloads.py w4). Paired interleaved depth 0
(unpacked ctrl, the r4 configuration) vs 1 vs 2.

Usage: python scripts/perf_seg_pose_packed.py [seg|pose] [pairs=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BATCH, STEPS = 8, 10


def build(which: str):
    from yolosharp_tpu.loss import pose_loss, segmentation_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    rng = np.random.default_rng(0)
    if which == "seg":
        task = "segment"
        loss_fn = lambda preds, batch, **kw: segmentation_loss(  # noqa: E731
            preds["one2many"], batch, nc=8)
        extra = {"masks": rng.integers(0, 9, (BATCH, 160, 160))
                 .astype(np.int32)}
    else:
        task = "pose"
        loss_fn = lambda preds, batch, **kw: pose_loss(  # noqa: E731
            preds["one2many"], batch, nc=8)
        extra = {"keypoints": rng.uniform(0, 1, (BATCH, 8, 17, 3))
                 .astype(np.float32)}
    cfg = ArchCfg(version="v11", size="m", task=task, nc=8, end2end=False)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 640, 640, 3), jnp.float32), False)
    batch = {
        "images": rng.integers(0, 255, (BATCH, 640, 640, 3), np.uint8),
        "cls": rng.integers(0, 8, (BATCH, 8)).astype(np.int32),
        "bboxes": rng.uniform(0.2, 0.6, (BATCH, 8, 4)).astype(np.float32),
        "mask_gt": np.ones((BATCH, 8), bool),
    }
    batch.update(extra)
    return net, variables, loss_fn, jax.device_put(batch)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "seg"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from yolosharp_tpu.train import TrainState, make_optimizer, make_train_step

    net, variables, loss_fn, batch = build(which)
    tx = make_optimizer(nc=8, epochs=2, steps_per_epoch=4)
    state = TrainState.create(variables, tx)

    steps = {d: make_train_step(net, loss_fn, compute_dtype=jnp.bfloat16,
                                donate=False, packed_stem=d > 0,
                                packed_depth=d) for d in (0, 1, 2)}

    def measure(step):
        st, loss, _ = step(state, batch, {})   # compile + warm
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss, _ = step(st, batch, {})
        float(loss)
        return (time.perf_counter() - t0) / STEPS

    print(f"v11m-{which}-640 b{BATCH} host-images step "
          f"(w4 program, paired interleaved)")
    for p in range(pairs):
        row = {d: measure(steps[d]) for d in (0, 1, 2)}
        d0, d1, d2 = row[0], row[1], row[2]
        print(f"pair {p}: depth0={d0*1e3:.2f} ms depth1={d1*1e3:.2f} ms "
              f"depth2={d2*1e3:.2f} ms "
              f"({BATCH/d0:.1f}/{BATCH/d1:.1f}/{BATCH/d2:.1f} img/s) "
              f"d2_vs_d0={(d0/d2-1)*100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
