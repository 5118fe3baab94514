"""xprof attribution for a non-detect family train step.

Builds the same synthetic step as scripts/bench_workloads.py w4/w5
(v11m-seg / v11m-pose 640 b8, or v12x E2E OBB 640 b4), times it, traces
one step, and prints the hlo_stats category/op attribution so the next
optimization aims at the measured sink.

Usage: python scripts/profile_family.py [seg|pose|obb] [trace_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def build(which: str):
    from yolosharp_tpu.loss import e2e_wrap, obb_loss, pose_loss, \
        segmentation_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet
    from yolosharp_tpu.train import TrainState, make_optimizer, \
        make_train_step

    rng = np.random.default_rng(0)
    kwargs = {}
    if which == "seg":
        cfg = ArchCfg(version="v11", size="m", task="segment", nc=8)
        loss_fn = lambda preds, batch, **kw: segmentation_loss(
            preds["one2many"], batch, nc=8)
        b, extra = 8, {"masks": rng.integers(0, 9, (8, 160, 160))
                       .astype(np.int32)}
    elif which == "pose":
        cfg = ArchCfg(version="v11", size="m", task="pose", nc=8)
        loss_fn = lambda preds, batch, **kw: pose_loss(
            preds["one2many"], batch, nc=8)
        b, extra = 8, {"keypoints": rng.uniform(0, 1, (8, 8, 17, 3))
                       .astype(np.float32)}
    elif which == "obb":
        cfg = ArchCfg(version="v12", size="x", task="obb", nc=15,
                      end2end=True)
        many = lambda preds, batch, **kw: obb_loss(preds, batch, nc=15)
        one = lambda preds, batch, **kw: obb_loss(preds, batch, nc=15,
                                                  tal_topk=1)
        loss_fn = e2e_wrap(many, one)
        kwargs = {"o2m_gain": 0.8, "o2o_gain": 1.0}
        b, extra = 4, {}
    else:
        raise SystemExit(f"unknown family {which!r}")

    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 640, 640, 3), jnp.float32), False)
    tx = make_optimizer(nc=cfg.nc, epochs=2, steps_per_epoch=4)
    state = TrainState.create(variables, tx)

    def mk_step():
        # fresh jit instance per call so paired harnesses can trace the
        # same step under different trace-time contexts (e.g. flax_bn())
        return make_train_step(net, loss_fn, compute_dtype=jnp.bfloat16,
                               donate=False)

    step_fn = mk_step()
    nc = cfg.nc
    bboxes = rng.uniform(0.2, 0.6, (b, 8, 4)).astype(np.float32)
    if which == "obb":
        bboxes = np.concatenate(
            [bboxes, rng.uniform(-0.7, 0.7, (b, 8, 1)).astype(np.float32)],
            -1)
    batch = jax.device_put({
        "images": rng.uniform(0, 255, (b, 640, 640, 3)).astype(np.uint8),
        "cls": rng.integers(0, nc, (b, 8)).astype(np.int32),
        "bboxes": bboxes,
        "mask_gt": np.ones((b, 8), bool),
        **extra})
    return step_fn, state, batch, kwargs, b, mk_step


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "seg"
    trace_dir = (sys.argv[2] if len(sys.argv) > 2
                 else f"/tmp/xprof_{which}")
    step_fn, state, batch, kwargs, b, _ = build(which)
    state2, loss, _ = step_fn(state, batch, kwargs)        # compile
    float(loss)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state2, loss, _ = step_fn(state, batch, kwargs)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"{which}: {dt*1e3:.2f} ms/step  {b/dt:.1f} img/s", flush=True)

    jax.profiler.start_trace(trace_dir)
    state2, loss, _ = step_fn(state, batch, kwargs)
    float(loss)
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir}", flush=True)

    # hlo_stats attribution (same gviz-JSON parse as profile_train.py)
    import re

    from xprof.convert import raw_to_tool_data as rtd

    xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                   recursive=True)
    xs.sort(key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", {})
    s = data.decode() if isinstance(data, bytes) else data
    by_cat, total, top = {}, 0.0, []
    for r in re.findall(r'\{"c":\[(.*?)\]\}', s):
        vals = [v.strip('"') for v in re.findall(r'\{"v":(.*?)\}(?:,|$)', r)]
        if len(vals) < 10:
            continue
        try:
            t = float(vals[9])
        except ValueError:
            continue
        total += t
        by_cat[vals[2]] = by_cat.get(vals[2], 0.0) + t
        top.append((t, vals[2], vals[3], vals[5][:90]))
    print(f"total device self time: {total/1e3:.2f} ms (1 step)")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {cat:32s} {t/1e3:8.2f} ms  {t/total:5.1%}")
    print("--- top 20 ops ---")
    for t, cat, name, fw in sorted(top, reverse=True)[:20]:
        print(f"  {t/1e3:6.2f} ms  {cat:22s} {name:26s} {fw}")


if __name__ == "__main__":
    main()
