"""Headline benchmark: YOLOv8s-640 predict throughput (images/sec/chip).

Full inference pipeline — forward (BN-folded, the deploy configuration) +
DFL/anchor decode + exact greedy NMS — as one jitted program, batch 32,
bf16, on the single visible device. Steady-state timing via an on-device
scan (one dispatch for N iterations; immune to host/tunnel latency).

Honest-workload calibration: with random weights every anchor clears the
0.25 confidence threshold, which no trained detector produces. The head's
class bias is shifted once so ~300 anchors/image clear the threshold
(dense-scene territory for a trained v8s); the NMS runs with a pre_topk=512 candidate pool and the result asserts `truncated == False`,
i.e. the measured configuration is *exact* greedy NMS for this workload.

Prints ONE JSON line. vs_baseline is relative to the round-1 recorded
1110.53 img/s (BENCH_r01.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BATCH = 32
IMGSZ = 640
ITERS = 10
GFLOPS_PER_IMG = 28.6     # Ultralytics-published v8s-640 forward FLOPs
PEAK_TFLOPS = 197.0       # TPU v5e bf16 peak
ROUND1_IPS = 1110.53


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolosharp_tpu.ckpt.fuse import bias_init, fold_bn
    from yolosharp_tpu.ckpt.mapping import flatten, head_index, unflatten
    from yolosharp_tpu.nn import (ArchCfg, YoloNet, fused_inference,
                              pallas_conv)
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference

    cfg = ArchCfg(version="v8", size="s", task="detect", nc=80,
                  end2end=False)
    net = YoloNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, IMGSZ, IMGSZ, 3), jnp.bfloat16)
    variables = net.init(key, jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32),
                         False)
    variables = bias_init(variables, 80)

    # ---- make the workload honest: an untrained net's activations decay
    # to numerical zero by the head (torch init x identity BN stats), so
    # scores come out spatially constant and the NMS would see a degenerate
    # all-equal pool. Scale kernels to keep activations alive and
    # re-randomize the head's final convs so scores/boxes vary per anchor
    # (same recipe as tests/test_golden_bus_predict.py), THEN shift cls
    # biases so ~300 anchors/img clear conf 0.25 (dense-scene territory
    # for a trained v8s).
    import re as _re

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
    # fold_bn returns host numpy — pin on device or every run() call would
    # re-upload ~44MB of params
    fused_vars = jax.device_put(fold_bn(variables))

    # ---- the measured program
    # measured: routing the Pallas conv loses ~2% in-graph (boundary
    # copies); see Config.pallas_conv
    use_pallas = False

    def predict(v, im):
        with fused_inference(), pallas_conv(use_pallas):
            preds = net.apply(v, im, False)
        dec = decode_inference(preds["one2many"], nc=80)
        out = non_max_suppression(dec, 0.25, 0.45, nc=80, pre_topk=512)
        return out

    @jax.jit
    def run(v, im):
        def step(carry, _):
            out = predict(v, im + carry.astype(im.dtype) * 1e-12)
            chk = out.scores.sum().astype(jnp.float32)
            return chk, out.truncated.any()

        chk, trunc = jax.lax.scan(step, jnp.float32(0.0), None,
                                  length=ITERS)
        return chk, trunc.any()

    # compile + warmup + exactness check
    chk, truncated = run(fused_vars, x)
    float(chk)
    assert not bool(truncated), (
        "candidate pool overflowed pre_topk — bench would not be exact NMS")
    n_cand = int((np.asarray(raw_scores(variables, x[:4])) > 0.25).sum() / 4)
    assert 50 <= n_cand <= 2048, (
        f"calibration produced a degenerate NMS workload ({n_cand} "
        "candidates/img) — the measured number would be dishonest")

    t0 = time.perf_counter()
    chk, _ = run(fused_vars, x)
    float(chk)
    dt = (time.perf_counter() - t0) / ITERS

    ips = BATCH / dt
    mfu = ips * GFLOPS_PER_IMG / 1e3 / PEAK_TFLOPS
    print(json.dumps({
        "metric": "images/sec/chip YOLOv8s-640 predict (batch 32, bf16, "
                  "fused conv+BN, incl. decode + exact(flagged) greedy NMS "
                  f"@ ~{n_cand} candidates/img)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / ROUND1_IPS, 3),
        "mfu": round(mfu, 4),
        "ms_per_batch": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
