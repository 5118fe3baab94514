"""Remat (activation-recompute) probe on the layout-bound family steps.

The round-5 xprof of the w5 step (v12x E2E OBB) shows 25% data
formatting + 5% copies — much of it saved-activation layout copies
between the forward and its transpose. jax.checkpoint on the model
forward recomputes activations in backward instead of saving them:
+~1 forward of MXU FLOPs (cheap at ~10% MFU) against those HBM
writes/copies. Paired interleaved ctrl-vs-remat on the w5 program and
the v11m-seg w4 program (both shipped packed defaults).

Usage: python scripts/perf_remat_probe.py [obb|seg] [pairs=3]
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


def build(which):
    from yolosharp_tpu.loss import e2e_wrap, obb_loss, segmentation_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    rng = np.random.default_rng(0)
    kw = {}
    if which == "seg":
        b = 8
        cfg = ArchCfg(version="v11", size="m", task="segment", nc=8)
        loss_fn = lambda preds, batch, **k: segmentation_loss(  # noqa: E731
            preds["one2many"], batch, nc=8)
        extra = {"masks": rng.integers(0, 9, (b, 160, 160)).astype(np.int32)}
        bboxes = rng.uniform(0.2, 0.6, (b, 8, 4)).astype(np.float32)
        nc = 8
    else:
        b = 4
        cfg = ArchCfg(version="v12", size="x", task="obb", nc=15,
                      end2end=True)
        loss_fn = e2e_wrap(
            lambda preds, batch, **k: obb_loss(preds, batch, nc=15),
            lambda preds, batch, **k: obb_loss(preds, batch, nc=15,
                                               tal_topk=1))
        kw = {"o2m_gain": 0.8, "o2o_gain": 1.0}
        extra = {}
        bboxes = np.concatenate(
            [rng.uniform(0.2, 0.6, (b, 8, 4)),
             rng.uniform(-0.7, 0.7, (b, 8, 1))], -1).astype(np.float32)
        nc = 15
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 640, 640, 3), jnp.float32), False)
    batch = {
        "images": rng.integers(0, 255, (b, 640, 640, 3), np.uint8),
        "cls": rng.integers(0, nc, (b, 8)).astype(np.int32),
        "bboxes": bboxes,
        "mask_gt": np.ones((b, 8), bool),
    }
    batch.update(extra)
    return net, variables, loss_fn, jax.device_put(batch), kw, b


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "obb"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from yolosharp_tpu.train import TrainState, make_optimizer, make_train_step

    net, variables, loss_fn, batch, kw, b = build(which)
    tx = make_optimizer(nc=8, epochs=2, steps_per_epoch=4)
    state = TrainState.create(variables, tx)

    steps = {r: make_train_step(net, loss_fn, compute_dtype=jnp.bfloat16,
                                donate=False, packed_stem=True,
                                packed_depth=2, remat=r)
             for r in (False, True)}

    def measure(step):
        st, loss, _ = step(state, batch, kw)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss, _ = step(st, batch, kw)
        float(loss)
        return (time.perf_counter() - t0) / STEPS

    print(f"{which} b{b} 640 host-images step: ctrl vs remat")
    for p in range(pairs):
        d0 = measure(steps[False])
        d1 = measure(steps[True])
        print(f"pair {p}: ctrl={d0*1e3:.2f}ms remat={d1*1e3:.2f}ms "
              f"({b/d0:.1f} vs {b/d1:.1f} img/s, {(d0/d1-1)*100:+.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
