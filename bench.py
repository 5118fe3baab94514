"""Headline benchmark: YOLOv8s-640 predict throughput (images/sec/chip).

Full inference pipeline — forward (BN-folded, the deploy configuration) +
DFL/anchor decode + exact greedy NMS — as one jitted program, batch 32,
bf16, on the single visible device. Steady-state timing via an on-device
scan (one dispatch for N iterations; immune to host/tunnel latency).

Honest-workload calibration: with random weights every anchor clears the
0.25 confidence threshold, which no trained detector produces. The head's
class bias is shifted once so ~300 anchors/image clear the threshold
(dense-scene territory for a trained v8s); the NMS runs with a
pre_topk=512 candidate pool and the result asserts `truncated == False`,
i.e. the measured configuration is *exact* greedy NMS for this workload.

Round-3 configurations measured:
 - bf16 (default; BENCH_S2D=N enables the exact space-to-depth stem
   rewrite for convs with cin <= N — measured a ~7% LOSS on v5e
   (1451/1462 vs 1565 img/s for s2d3/s2d16 vs off), so default 0)
 - int8 PTQ (quant_int8: symmetric per-channel weights / per-tensor
   calibrated activations, int32 MXU accumulation) + optional s2d
The headline number is the FASTEST configuration that passes the box
parity gate vs the bf16 path (matched-box IoU >= 0.999, same candidate
statistics); both measurements are reported.

Prints ONE JSON line. vs_baseline is relative to the round-1 recorded
1110.53 img/s (BENCH_r01.json).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BATCH = 32
IMGSZ = 640
ITERS = 10
GFLOPS_PER_IMG = 28.6     # Ultralytics-published v8s-640 forward FLOPs
PEAK_TFLOPS = 197.0       # TPU v5e bf16 peak
ROUND1_IPS = 1110.53
# train-step row (v8n-320 b16, the COCO128 fine-tune config = BASELINE
# workload 3, production path: device-augment render fused into the step
# with the shipped Config defaults). Prior-round reference: round 3's
# measured 9.7 ms/step = 1649 img/s (ROUND_NOTES, one-hot TAL rewrite)
# — that number was WITHOUT the render; the render-inclusive r3 control
# was ~19 ms (842 img/s). vs_train_r3 is computed against the
# render-inclusive number (same program class as this row).
TRAIN_BATCH, TRAIN_IMGSZ, TRAIN_ITERS = 16, 320, 10
# fallback when XLA cost analysis is unavailable; the reported train MFU
# uses the exact per-program FLOPs from
# jit(...).lower().compile().cost_analysis() (VERDICT r4 #6)
TRAIN_GFLOPS_PER_IMG = 8.7 / 4 * 3   # v8n fwd @320 ~= 8.7/4, train ~= 3x
ROUND3_TRAIN_IPS = 842.0
ROUND4_TRAIN_B64_IPS = 2896.0   # BASELINE.md round-3 batch sweep (22.1 ms)
ROUND4_V12X_OBB_MS = 121.0      # BASELINE.md round-4 FastBN family row
BENCH_TRAIN = os.environ.get("BENCH_TRAIN", "1") == "1"
# the measured-occupancy point (b64) and the v11m/v12x family rows — the
# BASELINE workload-4/5 program classes the b16 protocol row never sees
BENCH_TRAIN_B64 = os.environ.get("BENCH_TRAIN_B64", "1") == "1"
BENCH_FAMILY = os.environ.get("BENCH_FAMILY", "1") == "1"
S2D_MAX_CIN = int(os.environ.get("BENCH_S2D", "0"))
# int8 PTQ measured a LOSS on v5e (885.6 vs 1451 img/s same config +
# parity-gate fail at the 0.25-threshold boundary — ROUND_NOTES round 3);
# keep the switch for re-measurement but don't burn driver bench time on it
TRY_INT8 = os.environ.get("BENCH_INT8", "0") == "1"
# select-then-decode: top-k on raw logits BEFORE DFL/anchor decode (exact;
# see predict.decode_inference_topk). BENCH_TOPK_DECODE=0 for the control.
TOPK_DECODE = os.environ.get("BENCH_TOPK_DECODE", "1") == "1"
# TPU compiler tuning (latency-hiding scheduler + 64 MiB scoped VMEM):
# measured +1.2-2.4% paired on v5e for UNPACKED programs
# (scripts/perf_experiments_r3.py) — the production default for unpacked
# predict jits (Config.xla_predict_tuning / compile.py). Applied to the
# unpacked configuration only (stacking on host-s2d measured negative).
# BENCH_XLA_TUNING=0 for the control.
XLA_TUNING = os.environ.get("BENCH_XLA_TUNING", "1") == "1"
# host-packed space-to-depth input (the batched-serving default,
# Config.host_s2d): the host packs the uint8/bf16 canvas 2x2-to-depth
# (native ys_s2d_pack_u8; cost reported as host_pack_ms) and the stem runs
# as the exact stride-1 repacked conv. Measured +2.8..3.6% paired on v5e.
# BENCH_HOST_S2D=0 skips the packed measurement.
HOST_S2D = os.environ.get("BENCH_HOST_S2D", "1") == "1"
# deep packing: the stem also EMITS its output space-to-depth packed and
# conv1 consumes it (both early convs run with >=4x channels / full MXU
# lanes; still zero in-graph transposes — nn/common.py
# repack_s2d_kernel_deep). BENCH_DEEP_S2D=0 skips it.
DEEP_S2D = os.environ.get("BENCH_DEEP_S2D", "1") == "1"
# deeper packing: conv1 also emits packed and the layer-2 C2f runs
# entirely on the packed grid (parity-diagonal 1x1s + 3-tap packed 3x3
# bottleneck convs: 4x dense FLOPs for full MXU lanes on the measured
# 4.5%-MFU small-channel convs; layer 3 consumes FLOP-neutrally).
# BENCH_DEEPER_S2D=0 skips the measurement.
DEEPER_S2D = os.environ.get("BENCH_DEEPER_S2D", "1") == "1"
# depth-2 region (conv2 + layer-4 C2f too; the layer-4 skip output
# unpacks via one depth-to-space at 1/4 resolution).
DEEPER2_S2D = os.environ.get("BENCH_DEEPER2_S2D", "1") == "1"
# head-tower first-conv fusion (cv2.i.0 + cv3.i.0 share the input map —
# one (c2+c3)-channel 3x3, split; exact). The r4 occupancy arithmetic
# called it a wash; this measures it (VERDICT r4 #4a).
HEAD_FUSE = os.environ.get("BENCH_HEAD_FUSE", "1") == "1"


def build_calibrated_v8s(key, batch=BATCH, imgsz=IMGSZ):
    """v8s detect net + honest-workload variables (see module docstring).
    Returns (net, variables, fused_vars, x, n_cand)."""
    import re as _re

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolosharp_tpu.ckpt.fuse import bias_init, fold_bn
    from yolosharp_tpu.ckpt.mapping import flatten, head_index, unflatten
    from yolosharp_tpu.nn import ArchCfg, YoloNet
    from yolosharp_tpu.predict import decode_inference

    cfg = ArchCfg(version="v8", size="s", task="detect", nc=80,
                  end2end=False)
    net = YoloNet(cfg)
    x = jax.random.uniform(key, (batch, imgsz, imgsz, 3), jnp.bfloat16)
    variables = net.init(key, jnp.zeros((1, imgsz, imgsz, 3), jnp.float32),
                         False)
    variables = bias_init(variables, 80)

    # untrained nets decay to zero by the head: keep activations alive and
    # vary scores per anchor (tests/test_golden_bus_predict recipe), then
    # shift cls biases for ~300 candidates/img at conf 0.25
    params = flatten(variables["params"])
    hidx = head_index(variables["params"])
    prng = np.random.default_rng(3)
    for k in list(params):
        if k.endswith(".conv.kernel"):
            params[k] = (np.asarray(params[k]) * 2.5).astype(np.float32)
        if _re.match(rf"^{hidx}\.cv[23]\.\d\.2\.(kernel|bias)$", k):
            params[k] = prng.uniform(
                -0.3, 0.3, np.shape(params[k])).astype(np.float32)
    variables = dict(variables)
    variables["params"] = unflatten(params, variables["params"])

    @jax.jit
    def raw_scores(v, im):
        p = net.apply(v, im, False)
        dec = decode_inference(p["one2many"], nc=80)   # (B, 84, A)
        return dec[:, 4:84, :].max(axis=1)             # (B, A)

    s = np.asarray(raw_scores(variables, x[:4])).astype(np.float64)
    target = 300
    kth = np.sort(s.reshape(s.shape[0], -1), axis=-1)[:, -target].mean()
    kth = float(np.clip(kth, 1e-6, 1 - 1e-6))
    delta = float(np.log(0.25 / 0.75) - np.log(kth / (1 - kth)))
    params = flatten(variables["params"])
    for k in list(params):
        if k.startswith(f"{hidx}.cv3.") and k.endswith(".2.bias"):
            params[k] = np.asarray(params[k]) + delta
    variables = dict(variables)
    variables["params"] = unflatten(params, variables["params"])
    n_cand = int((np.asarray(raw_scores(variables, x[:4])) > 0.25).sum() / 4)
    fused_vars = jax.device_put(fold_bn(variables))
    return net, variables, fused_vars, x, n_cand


def _cost_flops(lowered_compiled):
    """Total FLOPs of a compiled XLA program, or None if unavailable."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def measure_train(b=TRAIN_BATCH, prefix="train"):
    """Production train-step throughput (v8n-320 detect, device-augment
    render included, shipped Config defaults for the render/stem path).
    MFU denominator comes from XLA cost analysis of the exact compiled
    program (falls back to the published-FLOPs estimate).
    Returns a dict of {prefix}_* keys for the bench JSON."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolosharp_tpu.config import Config
    from yolosharp_tpu.data import device_augment as DA
    from yolosharp_tpu.data.labels import LabelRecord
    from yolosharp_tpu.loss import detection_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet
    from yolosharp_tpu.train import (TrainState, make_optimizer,
                                     resolve_batch_images)

    s = TRAIN_IMGSZ
    cfg = Config(image_size=s, batch_size=b)
    # the production gating (tasks.py train): axis-aligned default hyps
    sep = (cfg.separable_render and cfg.degrees == 0 and cfg.shear == 0
           and cfg.perspective == 0)
    packed = cfg.train_packed_render
    # packed TRAIN region depth (v8 has a packed-rewritable layer-2 C2f,
    # so the full configured depth applies — same gate as tasks.py train)
    depth = cfg.train_packed_depth if packed else 0

    net = YoloNet(ArchCfg(version="v8", size="n", task="detect", nc=80))
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, s, s, 3), jnp.float32), False)
    tx = make_optimizer(nc=80, epochs=10, steps_per_epoch=8)
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(0)
    recs = [LabelRecord(im_file=f"synth{i}",
                        img=rng.integers(0, 255, (s, s, 3), np.uint8),
                        cls=np.array([1, 2], np.float32),
                        bboxes=np.array([[10, 10, 100, 100],
                                         [50, 50, 200, 200]], np.float32),
                        org_shape=(s, s), resized_shape=(s, s))
            for i in range(b)]
    plan, _ = DA.plan_mosaic_batch(recs, cfg, rng)
    batch = jax.device_put({
        "cls": rng.integers(0, 80, (b, 16)).astype(np.int32),
        "bboxes": rng.uniform(0.2, 0.6, (b, 16, 4)).astype(np.float32),
        "mask_gt": np.ones((b, 16), bool),
        "aug_pool": np.stack([r.img for r in recs]),
        "aug_src_idx": plan.src_idx, "aug_rects": plan.rects,
        "aug_pads": plan.pads, "aug_minv": plan.minv,
        "aug_persp": plan.persp, "aug_flips": plan.flips,
        "aug_hsv": plan.hsv,
    })

    @jax.jit
    def scan_steps(state, batch):
        import contextlib

        from yolosharp_tpu.nn.common import s2d_packed_input

        images, bb = resolve_batch_images(batch, jnp.bfloat16,
                                          packed=packed, separable=sep)

        def one_step(st, _):
            def loss_of(params):
                ctx = (s2d_packed_input(deep=depth >= 1,
                                        deeper=max(0, depth - 1),
                                        allow_train=depth >= 1)
                       if packed else contextlib.nullcontext())
                with ctx:
                    preds, upd = net.apply(
                        {"params": params, "batch_stats": st.batch_stats},
                        images, True, mutable=["batch_stats"])
                loss, _ = detection_loss(preds["one2many"], bb, nc=80)
                return loss, upd["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_of, has_aux=True)(st.params)
            import optax
            updates, new_opt = st.tx.update(grads, st.opt_state, st.params)
            st = st.replace(step=st.step + 1,
                            params=optax.apply_updates(st.params, updates),
                            batch_stats=stats, opt_state=new_opt)
            return st, loss

        _, losses = jax.lax.scan(one_step, state, None, length=TRAIN_ITERS)
        return losses[-1].astype(jnp.float32)

    compiled = scan_steps.lower(state, batch).compile()
    # NB cost_analysis counts a lax.scan/while body ONCE regardless of
    # trip count (verified empirically on this backend), so the program's
    # reported flops already equal ONE train step
    flops = _cost_flops(compiled)
    gflops_per_img = (flops / b / 1e9 if flops
                      else TRAIN_GFLOPS_PER_IMG)
    float(compiled(state, batch))            # warm
    t0 = time.perf_counter()
    float(compiled(state, batch))
    dt = (time.perf_counter() - t0) / TRAIN_ITERS
    ips = b / dt
    mfu = ips * gflops_per_img / 1e3 / PEAK_TFLOPS
    out = {f"{prefix}_ips": round(ips, 2),
           f"{prefix}_ms_per_step": round(dt * 1e3, 2),
           f"{prefix}_mfu": round(mfu, 4),
           f"{prefix}_gflops_per_img_xla": (round(gflops_per_img, 2)
                                            if flops else None),
           f"{prefix}_config": (f"v8n-{s} b{b} detect+render"
                                f"{'+sep' if sep else ''}"
                                f"{'+pack' if packed else ''}"
                                f"{f'+d{depth}' if depth else ''}")}
    if prefix == "train":
        out["train_vs_r3"] = round(ips / ROUND3_TRAIN_IPS, 3)
    return out


def measure_family_obb():
    """Driver-visible BASELINE workload-5 row: YOLOv12x-640 End2End OBB
    train step (batch 4, bf16, dual-head rotated TAL + angle loss) — the
    m/x-size program class the v8n train row never exercises. Same program
    as scripts/bench_workloads.py w5 (host-images step, per-call timing)
    so the series stays comparable with the recorded family rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolosharp_tpu.loss import e2e_wrap, obb_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet
    from yolosharp_tpu.train import (TrainState, make_optimizer,
                                     make_train_step)

    rng = np.random.default_rng(0)
    cfg = ArchCfg(version="v12", size="x", task="obb", nc=15, end2end=True)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 640, 640, 3), jnp.float32), False)
    loss_fn = e2e_wrap(
        lambda preds, batch, **kw: obb_loss(preds, batch, nc=15),
        lambda preds, batch, **kw: obb_loss(preds, batch, nc=15, tal_topk=1))
    tx = make_optimizer(nc=15, epochs=2, steps_per_epoch=4)
    state = TrainState.create(variables, tx)
    # shipped defaults: host batches pack via in-graph uint8 s2d
    # (train_packed_depth=2; measured neutral-to-positive on this program,
    # BASELINE.md round 5)
    step_fn = make_train_step(net, loss_fn, compute_dtype=jnp.bfloat16,
                              donate=False, packed_stem=True, packed_depth=2)
    def run(b):
        bboxes = np.concatenate(
            [rng.uniform(0.2, 0.6, (b, 8, 4)),
             rng.uniform(-0.7, 0.7, (b, 8, 1))], -1).astype(np.float32)
        batch = jax.device_put({
            "images": rng.uniform(0, 255, (b, 640, 640, 3)).astype(np.uint8),
            "cls": rng.integers(0, 15, (b, 8)).astype(np.int32),
            "bboxes": bboxes,
            "mask_gt": np.ones((b, 8), bool),
        })
        kw = {"o2m_gain": 0.8, "o2o_gain": 1.0}
        st, loss, _ = step_fn(state, batch, kw)     # compile
        float(loss)
        # median of 3 pipelined 5-step repetitions: same dispatch pattern
        # as the recorded family rows (5 async steps, one sync), with the
        # median absorbing the tunnel's occasional 2-4x stragglers
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                st, loss, _ = step_fn(st, batch, kw)
            float(loss)
            reps.append((time.perf_counter() - t0) / 5)
        return sorted(reps)[1]

    dt = run(4)
    # b8 = the measured occupancy/saturation point (+95% img/s over the
    # b4 protocol batch, ~3% more wall per step; b16 is past saturation
    # - BASELINE.md round 5). The protocol row stays b4.
    dt8 = run(8)
    return {"v12x_obb_ms_per_step": round(dt * 1e3, 2),
            "v12x_obb_ips": round(4 / dt, 2),
            "v12x_obb_vs_r4": round(ROUND4_V12X_OBB_MS / (dt * 1e3), 3),
            "v12x_obb_b8_ips": round(8 / dt8, 2)}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolosharp_tpu.nn import (fused_inference, pallas_conv,
                                  quant_calibrate, quant_int8, s2d_stride2)
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference, decode_inference_topk

    key = jax.random.PRNGKey(0)
    net, variables, fused_vars, x, n_cand = build_calibrated_v8s(key)
    assert 50 <= n_cand <= 2048, (
        f"calibration produced a degenerate NMS workload ({n_cand} "
        "candidates/img) — the measured number would be dishonest")

    from yolosharp_tpu.nn import s2d_packed_input

    def make_predict(int8, packed=False, deep=False, deeper=False,
                     headfuse=False):
        from yolosharp_tpu.nn.common import head_fuse

        def predict(v, im):
            with fused_inference(), pallas_conv(False), \
                    s2d_stride2(S2D_MAX_CIN), quant_int8(int8), \
                    s2d_packed_input(packed, deep=deep, deeper=deeper), \
                    head_fuse(headfuse):
                preds = net.apply(v, im, False)
            if TOPK_DECODE:
                dec, trunc = decode_inference_topk(
                    preds["one2many"], nc=80, conf_thres=0.25, k=512)
                out = non_max_suppression(dec, 0.25, 0.45, nc=80)
                return out._replace(truncated=out.truncated | trunc)
            dec = decode_inference(preds["one2many"], nc=80)
            return non_max_suppression(dec, 0.25, 0.45, nc=80, pre_topk=512)
        return predict

    from yolosharp_tpu.compile import predict_jit

    def measure(predict, v, im=None, tune=XLA_TUNING):
        im = x if im is None else im

        @partial(predict_jit, tune=tune)
        def run(v, im):
            def step(carry, _):
                out = predict(v, im + carry.astype(im.dtype) * 1e-12)
                chk = out.scores.sum().astype(jnp.float32)
                return chk, out.truncated.any()

            chk, trunc = jax.lax.scan(step, jnp.float32(0.0), None,
                                      length=ITERS)
            return chk, trunc.any()

        chk, truncated = run(v, im)     # compile + warmup
        float(chk)
        assert not bool(truncated), (
            "candidate pool overflowed pre_topk — bench would not be "
            "exact NMS")
        t0 = time.perf_counter()
        chk, _ = run(v, im)
        float(chk)
        return (time.perf_counter() - t0) / ITERS

    bf16_predict = make_predict(int8=False)
    dt_bf16 = measure(bf16_predict, fused_vars)
    tag = "+seldec" if TOPK_DECODE else ""
    tag += "+xlatune" if XLA_TUNING else ""
    result = {"config": f"bf16+s2d{S2D_MAX_CIN}{tag}", "dt": dt_bf16}
    extra = {"bf16_ips": round(BATCH / dt_bf16, 2)}

    if HOST_S2D:
        # the batched-serving default: stem input host-packed 2x2-to-depth
        # (exact; tests/test_fuse.py) — stacking compiler tuning on the
        # packed program measured negative, so it runs untuned
        from yolosharp_tpu.native import s2d_pack_u8
        from yolosharp_tpu.nn import host_space_to_depth2

        xp = jnp.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                         jnp.bfloat16)
        dt_packed = measure(make_predict(int8=False, packed=True),
                            fused_vars, im=xp, tune=False)
        # honest host-side cost: the native threaded uint8 pack per batch
        xu8 = (np.asarray(x, np.float32) * 255).astype(np.uint8)
        s2d_pack_u8(xu8)
        t0 = time.perf_counter()
        for _ in range(5):
            s2d_pack_u8(xu8)
        pack_ms = (time.perf_counter() - t0) / 5 * 1e3
        extra.update(hosts2d_ips=round(BATCH / dt_packed, 2),
                     host_pack_ms=round(pack_ms, 2))
        if dt_packed < result["dt"]:
            tag = "+seldec" if TOPK_DECODE else ""
            result = {"config": f"bf16+hosts2d{tag}", "dt": dt_packed}
        if DEEP_S2D:
            dt_deep = measure(make_predict(int8=False, packed=True,
                                           deep=True),
                              fused_vars, im=xp, tune=False)
            extra.update(hosts2d_deep_ips=round(BATCH / dt_deep, 2))
            if dt_deep < result["dt"]:
                tag = "+seldec" if TOPK_DECODE else ""
                result = {"config": f"bf16+hosts2d-deep{tag}",
                          "dt": dt_deep}
        if DEEPER_S2D:
            dt_deeper = measure(make_predict(int8=False, packed=True,
                                             deeper=1),
                                fused_vars, im=xp, tune=False)
            extra.update(hosts2d_deeper_ips=round(BATCH / dt_deeper, 2))
            if dt_deeper < result["dt"]:
                tag = "+seldec" if TOPK_DECODE else ""
                result = {"config": f"bf16+hosts2d-deeper{tag}",
                          "dt": dt_deeper}
        if DEEPER2_S2D:
            # depth-2 candidate: the packed region also swallows conv2 +
            # the layer-4 C2f (a skip source — its final 1x1 emits plain
            # via one cheap depth-to-space at quarter resolution)
            dt_deeper2 = measure(make_predict(int8=False, packed=True,
                                              deeper=2),
                                 fused_vars, im=xp, tune=False)
            extra.update(hosts2d_deeper2_ips=round(BATCH / dt_deeper2, 2))
            if dt_deeper2 < result["dt"]:
                tag = "+seldec" if TOPK_DECODE else ""
                result = {"config": f"bf16+hosts2d-deeper2{tag}",
                          "dt": dt_deeper2}
        if HEAD_FUSE:
            # head-tower first-conv fusion stacked on the deeper region
            dt_hf = measure(make_predict(int8=False, packed=True,
                                         deeper=1, headfuse=True),
                            fused_vars, im=xp, tune=False)
            extra.update(hosts2d_deeper_headfuse_ips=round(
                BATCH / dt_hf, 2))
            if dt_hf < result["dt"]:
                tag = "+seldec" if TOPK_DECODE else ""
                result = {"config": f"bf16+hosts2d-deeper-headfuse{tag}",
                          "dt": dt_hf}

    if TRY_INT8:
        # per-workload activation calibration through the measured graph
        @jax.jit
        def cal(v, im):
            with fused_inference(), s2d_stride2(S2D_MAX_CIN), \
                    quant_calibrate():
                return net.apply(v, im, False, mutable=["quant_stats"])

        _, upd = cal(fused_vars, x[:8])
        int8_vars = jax.device_put(
            {**fused_vars, "quant_stats": jax.device_get(
                upd["quant_stats"])})
        int8_predict = make_predict(int8=True)

        # box parity gate vs the bf16 path (BASELINE parity clause)
        ref = jax.device_get(jax.jit(bf16_predict)(fused_vars, x[:4]))
        got = jax.device_get(jax.jit(int8_predict)(int8_vars, x[:4]))
        ious, n_ref, n_match = [], 0, 0
        for i in range(4):
            rb = ref.boxes[i][np.asarray(ref.valid[i])]
            gb = got.boxes[i][np.asarray(got.valid[i])]
            n_ref += len(rb)
            if not len(rb) or not len(gb):
                continue
            x1 = np.maximum(rb[:, None, 0], gb[None, :, 0])
            y1 = np.maximum(rb[:, None, 1], gb[None, :, 1])
            x2 = np.minimum(rb[:, None, 2], gb[None, :, 2])
            y2 = np.minimum(rb[:, None, 3], gb[None, :, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            area_r = ((rb[:, 2] - rb[:, 0]) * (rb[:, 3] - rb[:, 1]))
            area_g = ((gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]))
            iou = inter / (area_r[:, None] + area_g[None] - inter + 1e-9)
            best = iou.max(axis=1)
            n_match += int((best > 0.9).sum())
            ious.append(best[best > 0.9])
        mean_iou = float(np.concatenate(ious).mean()) if ious else 0.0
        match_frac = n_match / max(n_ref, 1)
        parity_ok = mean_iou >= 0.999 and match_frac >= 0.97
        dt_int8 = measure(int8_predict, int8_vars)
        extra.update(int8_ips=round(BATCH / dt_int8, 2),
                     int8_matched_box_iou=round(mean_iou, 5),
                     int8_match_frac=round(match_frac, 4),
                     int8_parity_ok=parity_ok)
        if parity_ok and dt_int8 < result["dt"]:
            result = {"config": f"int8+s2d{S2D_MAX_CIN}", "dt": dt_int8}

    if BENCH_TRAIN:
        extra.update(measure_train())
        if BENCH_TRAIN_B64:
            # the measured-occupancy point (BASELINE round-3 batch sweep):
            # user-buyable throughput at the saturating batch
            b64 = measure_train(b=64, prefix="train_b64")
            b64["train_b64_vs_r4"] = round(
                b64["train_b64_ips"] / ROUND4_TRAIN_B64_IPS, 3)
            extra.update(b64)
    if BENCH_FAMILY:
        extra.update(measure_family_obb())

    # predict MFU cross-check: exact FLOPs of the compiled forward+decode+
    # NMS program from XLA cost analysis vs the published 28.6 GFLOPs
    try:
        pc = jax.jit(bf16_predict).lower(fused_vars, x).compile()
        pflops = _cost_flops(pc)
    except Exception:
        pflops = None

    dt = result["dt"]
    ips = BATCH / dt
    mfu = ips * GFLOPS_PER_IMG / 1e3 / PEAK_TFLOPS
    if pflops:
        gpi = pflops / BATCH / 1e9
        extra.update(predict_gflops_per_img_xla=round(gpi, 2),
                     mfu_xla=round(ips * gpi / 1e3 / PEAK_TFLOPS, 4))
    print(json.dumps({
        "metric": "images/sec/chip YOLOv8s-640 predict (batch 32, "
                  f"{result['config']}, fused conv+BN, incl. decode + "
                  f"exact(flagged) greedy NMS @ ~{n_cand} candidates/img)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / ROUND1_IPS, 3),
        "mfu": round(mfu, 4),
        "ms_per_batch": round(dt * 1e3, 2),
        **extra,
    }))


if __name__ == "__main__":
    main()
