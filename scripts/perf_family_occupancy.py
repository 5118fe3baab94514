"""Occupancy sweep for the family workloads (user-buyable throughput).

The w5 probe (perf_obb_tuning) showed v12x E2E OBB at b8 costs ~3% more
wall per step than b4 — +95% img/s. This sweeps batch sizes on the w4/w5
programs (shipped packed defaults) to find each family's saturation
point, mirroring the v8n train b64 occupancy row.

Usage: python scripts/perf_family_occupancy.py [seg|pose|obb] [batches...]
e.g. python scripts/perf_family_occupancy.py obb 4 8 16
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

STEPS = 5


def build(which, b):
    from yolosharp_tpu.loss import (e2e_wrap, obb_loss, pose_loss,
                                    segmentation_loss)
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    rng = np.random.default_rng(0)
    extra, kw = {}, {}
    if which == "seg":
        cfg = ArchCfg(version="v11", size="m", task="segment", nc=8)
        loss_fn = lambda preds, batch, **k: segmentation_loss(  # noqa: E731
            preds["one2many"], batch, nc=8)
        extra = {"masks": rng.integers(0, 9, (b, 160, 160)).astype(np.int32)}
    elif which == "pose":
        cfg = ArchCfg(version="v11", size="m", task="pose", nc=8)
        loss_fn = lambda preds, batch, **k: pose_loss(  # noqa: E731
            preds["one2many"], batch, nc=8)
        extra = {"keypoints": rng.uniform(0, 1, (b, 8, 17, 3))
                 .astype(np.float32)}
    else:
        cfg = ArchCfg(version="v12", size="x", task="obb", nc=15,
                      end2end=True)
        loss_fn = e2e_wrap(
            lambda preds, batch, **k: obb_loss(preds, batch, nc=15),
            lambda preds, batch, **k: obb_loss(preds, batch, nc=15,
                                               tal_topk=1))
        kw = {"o2m_gain": 0.8, "o2o_gain": 1.0}
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 640, 640, 3), jnp.float32), False)
    nb = 5 if which == "obb" else 4
    batch = {
        "images": rng.integers(0, 255, (b, 640, 640, 3), np.uint8),
        "cls": rng.integers(0, 8, (b, 8)).astype(np.int32),
        "bboxes": (np.concatenate(
            [rng.uniform(0.2, 0.6, (b, 8, 4)),
             rng.uniform(-0.7, 0.7, (b, 8, 1))], -1).astype(np.float32)
            if nb == 5 else
            rng.uniform(0.2, 0.6, (b, 8, 4)).astype(np.float32)),
        "mask_gt": np.ones((b, 8), bool),
    }
    batch.update(extra)
    return net, variables, loss_fn, jax.device_put(batch), kw


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "obb"
    batches = [int(x) for x in sys.argv[2:]] or [4, 8, 16]
    from yolosharp_tpu.train import TrainState, make_optimizer, make_train_step

    print(f"{which} occupancy sweep (shipped packed defaults)")
    for b in batches:
        net, variables, loss_fn, batch, kw = build(which, b)
        tx = make_optimizer(nc=8, epochs=2, steps_per_epoch=4)
        state = TrainState.create(variables, tx)
        step = make_train_step(net, loss_fn, compute_dtype=jnp.bfloat16,
                               donate=False, packed_stem=True,
                               packed_depth=2)
        try:
            st, loss, _ = step(state, batch, kw)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(STEPS):
                st, loss, _ = step(st, batch, kw)
            float(loss)
            dt = (time.perf_counter() - t0) / STEPS
            print(f"  b{b}: {dt*1e3:.2f} ms/step  {b/dt:.1f} img/s",
                  flush=True)
        except Exception as e:  # OOM etc.
            print(f"  b{b}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)


if __name__ == "__main__":
    main()
