"""v12x E2E OBB train step: XLA tuning flags + batch occupancy.

The round-5 xprof attribution of the w5 program (scripts/profile_family.py
obb) puts only 34% of device self-time in convolution fusions — data
formatting 25%, loop fusion 22%, pad 8% dominate, i.e. the step is
layout/materialization-bound at ~10% MFU. Two levers measured here,
paired interleaved against the unpacked b4 control:

  tuned: the predict-side per-program compiler options
         (latency-hiding scheduler + 64 MiB scoped vmem,
         compile.PREDICT_TUNING) applied to the train jit
         (make_train_step compiler_options).
  b8:    double the per-step batch (occupancy; protocol row stays b4 —
         this is the user-buyable capability row, like train_b64).

Usage: python scripts/perf_obb_tuning.py [pairs=3]
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


def build(batch_size):
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
    b = batch_size
    bboxes = np.concatenate(
        [rng.uniform(0.2, 0.6, (b, 8, 4)),
         rng.uniform(-0.7, 0.7, (b, 8, 1))], -1).astype(np.float32)
    batch = jax.device_put({
        "images": rng.uniform(0, 255, (b, 640, 640, 3)).astype(np.uint8),
        "cls": rng.integers(0, 15, (b, 8)).astype(np.int32),
        "bboxes": bboxes,
        "mask_gt": np.ones((b, 8), bool),
    })
    return net, variables, loss_fn, batch


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from yolosharp_tpu.compile import PREDICT_TUNING
    from yolosharp_tpu.train import TrainState, make_optimizer, make_train_step

    net, variables, loss_fn, batch4 = build(4)
    _, _, _, batch8 = build(8)
    tx = make_optimizer(nc=15, epochs=2, steps_per_epoch=4)
    state = TrainState.create(variables, tx)
    kw = {"o2m_gain": 0.8, "o2o_gain": 1.0}

    mk = lambda **kws: make_train_step(  # noqa: E731
        net, loss_fn, compute_dtype=jnp.bfloat16, donate=False, **kws)
    cands = {
        "ctrl_b4": (mk(), batch4, 4),
        "tuned_b4": (mk(compiler_options=PREDICT_TUNING), batch4, 4),
        "ctrl_b8": (mk(), batch8, 8),
    }

    def measure(step, batch):
        st, loss, _ = step(state, batch, kw)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, loss, _ = step(st, batch, kw)
        float(loss)
        return (time.perf_counter() - t0) / STEPS

    print("v12x-640 E2E OBB host-images step: XLA tuning + occupancy")
    for p in range(pairs):
        row = {}
        for name, (step, batch, b) in cands.items():
            dt = measure(step, batch)
            row[name] = (dt, b / dt)
        msg = " ".join(f"{n}={dt*1e3:.2f}ms({ips:.1f}img/s)"
                       for n, (dt, ips) in row.items())
        t_gain = (row["ctrl_b4"][0] / row["tuned_b4"][0] - 1) * 100
        o_gain = (row["ctrl_b8"][1] / row["ctrl_b4"][1] - 1) * 100
        print(f"pair {p}: {msg} tuned={t_gain:+.1f}% b8_ips={o_gain:+.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
