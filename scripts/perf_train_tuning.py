"""TPU compiler tuning for the TRAIN step (real chip, paired interleaved).

The predict-side experiments (perf_experiments_r3.py) found the
latency-hiding scheduler and a 64 MiB scoped-VMEM limit are paired wins on
the unpacked predict program. The train step is a different program class
(fwd + TAL assigner + loss + bwd + AdamW, ~3x the predict FLOPs, big
live-range pressure from saved activations) — measure, don't assume.

Workload: v8n-320 detect train step, batch 16 (the COCO128 fine-tune
config, BASELINE workload 3). Timing = on-device lax.scan of 10 full
steps carrying TrainState (one dispatch; immune to tunnel latency), same
synthetic batch each iteration, non-donated outer state so the timed fn
is re-runnable.

Usage: python scripts/perf_train_tuning.py [pairs=3] [candidates...]
Env: YS_IMGSZ=320|640|1280 (workload size), YS_BATCH=16.
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

from yolosharp_tpu.loss import detection_loss
from yolosharp_tpu.nn import ArchCfg, YoloNet
from yolosharp_tpu.train import TrainState, make_optimizer

BATCH = int(os.environ.get("YS_BATCH", "16"))
IMGSZ = int(os.environ.get("YS_IMGSZ", "320"))
ITERS = 10
# v8n-640 fwd = 8.7 GFLOPs (Ultralytics); scales with area, train ~= 3x fwd
GFLOPS_PER_IMG = 8.7 * (IMGSZ / 640) ** 2 * 3
PEAK_TFLOPS = 197.0


def build(render: bool = False):
    cfg = ArchCfg(version="v8", size="n", task="detect", nc=80)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32), False)
    tx = make_optimizer(nc=80, epochs=10, steps_per_epoch=8)
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(0)
    batch = {
        "cls": rng.integers(0, 80, (BATCH, 16)).astype(np.int32),
        "bboxes": rng.uniform(0.2, 0.6, (BATCH, 16, 4)).astype(np.float32),
        "mask_gt": np.ones((BATCH, 16), bool),
    }
    if render:
        # the production configuration: uint8 source pool + device-side
        # mosaic/perspective/HSV render fused into the step
        from yolosharp_tpu.config import Config
        from yolosharp_tpu.data import device_augment as DA
        from yolosharp_tpu.data.labels import LabelRecord

        dcfg = Config(train_data_path="", image_size=IMGSZ)
        recs = [LabelRecord(im_file=f"synth{i}",
                            img=rng.integers(0, 255, (IMGSZ, IMGSZ, 3),
                                             np.uint8),
                            cls=np.array([1, 2], np.float32),
                            bboxes=np.array([[10, 10, 100, 100],
                                             [50, 50, 200, 200]],
                                            np.float32),
                            org_shape=(IMGSZ, IMGSZ),
                            resized_shape=(IMGSZ, IMGSZ))
                for i in range(BATCH)]
        plan, _ = DA.plan_mosaic_batch(recs, dcfg, rng)
        pool = np.stack([r.img for r in recs])
        batch.update(aug_pool=pool, aug_src_idx=plan.src_idx,
                     aug_rects=plan.rects, aug_pads=plan.pads,
                     aug_minv=plan.minv, aug_persp=plan.persp,
                     aug_flips=plan.flips, aug_hsv=plan.hsv)
    else:
        batch["images"] = rng.uniform(
            0, 1, (BATCH, IMGSZ, IMGSZ, 3)).astype(np.float32)
    batch = jax.device_put(batch)
    return net, state, batch


def make_run(net, compiler_options=None, s2d_train=0, packed_render=False,
             render=False, separable=False, packed_depth=0,
             flax=False):
    import contextlib

    from yolosharp_tpu.nn.common import flax_bn, s2d_packed_input, \
        s2d_stride2

    def scan_steps(state, batch):
        if render:
            from yolosharp_tpu.data.device_augment import \
                mosaic_perspective_images

            arrays = (batch["aug_src_idx"], batch["aug_rects"],
                      batch["aug_pads"], batch["aug_minv"],
                      batch["aug_persp"], batch["aug_flips"],
                      batch["aug_hsv"])
            images = mosaic_perspective_images(
                batch["aug_pool"], arrays, IMGSZ, packed=packed_render,
                separable=separable)
            images = images.astype(jnp.bfloat16) / 255.0
        else:
            images = batch["images"].astype(jnp.bfloat16)

        def one_step(st, _):
            def loss_of(params):
                variables = {"params": params,
                             "batch_stats": st.batch_stats}
                ctx = (s2d_packed_input(deep=packed_depth >= 1,
                                        deeper=max(0, packed_depth - 1),
                                        allow_train=packed_depth >= 1)
                       if packed_render else contextlib.nullcontext())
                bctx = flax_bn() if flax else contextlib.nullcontext()
                with s2d_stride2(s2d_train, allow_train=s2d_train > 0), \
                        ctx, bctx:
                    preds, upd = net.apply(variables, images, True,
                                           mutable=["batch_stats"])
                loss, items = detection_loss(preds["one2many"], batch,
                                             nc=80)
                return loss, (items, upd["batch_stats"])

            (loss, (_, stats)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(st.params)
            import optax
            updates, new_opt = st.tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            st = st.replace(step=st.step + 1, params=new_params,
                            batch_stats=stats, opt_state=new_opt)
            return st, loss

        final, losses = jax.lax.scan(one_step, state, None, length=ITERS)
        return losses[-1].astype(jnp.float32)

    kw = {}
    if compiler_options:
        kw["compiler_options"] = compiler_options
    return jax.jit(scan_steps, **kw)


def measure(run, state, batch):
    float(run(state, batch))           # compile + warm
    t0 = time.perf_counter()
    float(run(state, batch))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, BATCH / dt


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    want = set(sys.argv[2:])
    render = (bool({"render", "renderpack", "sep", "seppack",
                    "sppd1", "sppd2"} & want)
              if want else False)
    net, state, batch = build(render=render)
    ctrl = make_run(net, render=render)
    cands = [
        ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}, 0,
         False),
        ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}, 0, False),
        ("combo64", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                     "xla_tpu_scoped_vmem_limit_kib": "65536"}, 0, False),
        ("s2d3", None, 3, False),     # train-mode s2d stem rewrite
        ("s2d16", None, 16, False),   # + conv1
        # production device-augment render fused into the step, with the
        # canvas emitted space-to-depth packed at the gather (free) and
        # the stem run as the repacked train-mode conv. Control for these
        # is the plain render ("render" itself measures render vs ctrl).
        ("render", None, 0, False),
        ("renderpack", None, 0, True),
        # separable render (dense per-tile interpolation matmuls instead
        # of gathers — the shipped default, Config.separable_render) with
        # and without the packed canvas. Control stays the gather render.
        ("sep", None, 0, False),
        ("seppack", None, 0, True),
        # packed TRAIN region (make_train_step packed_depth): the stem
        # emits s2d-packed (+conv1 consumes) at depth 1; at depth 2 conv1
        # also emits and the layer-2 CSP runs on the packed grid with
        # real parity-axis BN. Both ride the separable packed render.
        ("sppd1", None, 0, True),
        ("sppd2", None, 0, True),
        # the shipped packed-train default with flax's f32-materializing
        # BatchNorm instead of FastBN (measures the FastBN win on the
        # headline program; ctrl for this is sppd2 itself)
        ("sppd2flax", None, 0, True),
    ]
    depths = {"sppd1": 1, "sppd2": 2, "sppd2flax": 2}
    runs = []
    for name, opts, s2d, prender in cands:
        if want and name not in want:
            continue
        try:
            runs.append((name, make_run(net, opts, s2d_train=s2d,
                                        packed_render=prender,
                                        render=render or prender
                                        or name in ("render", "sep"),
                                        separable=name in ("sep", "seppack",
                                                           "sppd1", "sppd2",
                                                           "sppd2flax"),
                                        packed_depth=depths.get(name, 0),
                                        flax=name.endswith("flax"))))
        except Exception as e:
            print(f"{name}: UNSUPPORTED ({type(e).__name__}: {e})",
                  flush=True)
    measure(ctrl, state, batch)        # warm ctrl outside the pairs
    for rep in range(pairs):
        for name, run in runs:
            c_dt, c_ips = measure(ctrl, state, batch)
            e_dt, e_ips = measure(run, state, batch)
            mfu = e_ips * GFLOPS_PER_IMG / 1e3 / PEAK_TFLOPS
            print(f"[{rep}] ctrl {c_dt*1e3:6.2f} ms ({c_ips:6.1f} img/s) | "
                  f"{name:8s} {e_dt*1e3:6.2f} ms ({e_ips:6.1f} img/s, "
                  f"~{mfu*100:.1f}% MFU) {e_ips/c_ips - 1:+.1%}",
                  flush=True)


if __name__ == "__main__":
    main()
