"""Paired measurement: host-batch s2d packing on the w5 program.

Round 5 packs HOST-prepared batches via one in-graph uint8
space_to_depth2 (train.resolve_batch_images), which buys the packed
train region (stem / conv1 / layer-2 CSP with _PackedC3k) for the
host-images steps: the close-mosaic tail, letterbox trainings, and the
family bench rows. This measures the exact BASELINE workload-5 program
(YOLOv12x-640 End2End OBB train step, batch 4, bf16, dual-head rotated
TAL + angle loss — bench.measure_family_obb) paired interleaved at
depth 0 (unpacked ctrl, the r4 configuration) vs 1 vs 2.

Usage: python scripts/perf_obb_packed.py [pairs=3]
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

BATCH, STEPS = 4, 5


def build():
    from yolosharp_tpu.loss import e2e_wrap, obb_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    rng = np.random.default_rng(0)
    cfg = ArchCfg(version="v12", size="x", task="obb", nc=15, end2end=True)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 640, 640, 3), jnp.float32), False)
    loss_fn = e2e_wrap(
        lambda preds, batch, **kw: obb_loss(preds, batch, nc=15),
        lambda preds, batch, **kw: obb_loss(preds, batch, nc=15, tal_topk=1))
    bboxes = np.concatenate(
        [rng.uniform(0.2, 0.6, (BATCH, 8, 4)),
         rng.uniform(-0.7, 0.7, (BATCH, 8, 1))], -1).astype(np.float32)
    batch = jax.device_put({
        "images": rng.uniform(0, 255, (BATCH, 640, 640, 3)).astype(np.uint8),
        "cls": rng.integers(0, 15, (BATCH, 8)).astype(np.int32),
        "bboxes": bboxes,
        "mask_gt": np.ones((BATCH, 8), bool),
    })
    return net, variables, loss_fn, batch


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from yolosharp_tpu.train import TrainState, make_optimizer, make_train_step

    net, variables, loss_fn, batch = build()
    tx = make_optimizer(nc=15, epochs=2, steps_per_epoch=4)
    state = TrainState.create(variables, tx)
    kw = {"o2m_gain": 0.8, "o2o_gain": 1.0}

    steps = {d: make_train_step(net, loss_fn, compute_dtype=jnp.bfloat16,
                                donate=False, packed_stem=d > 0,
                                packed_depth=d) for d in (0, 1, 2)}

    def measure(step):
        st, loss, _ = step(state, batch, kw)   # compile + warm
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss, _ = step(st, batch, kw)
        float(loss)
        return (time.perf_counter() - t0) / STEPS

    print(f"v12x-640 E2E OBB b{BATCH} host-images step "
          f"(w5 program, paired interleaved)")
    for p in range(pairs):
        row = {d: measure(steps[d]) for d in (0, 1, 2)}
        d0, d1, d2 = row[0], row[1], row[2]
        print(f"pair {p}: depth0={d0*1e3:.2f} ms depth1={d1*1e3:.2f} ms "
              f"depth2={d2*1e3:.2f} ms "
              f"({BATCH/d0:.1f}/{BATCH/d1:.1f}/{BATCH/d2:.1f} img/s) "
              f"d2_vs_d0={(d0/d2-1)*100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
