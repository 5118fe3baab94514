"""Headline benchmark: YOLOv8s-640 predict throughput (images/sec/chip).

Runs the full inference pipeline — forward + DFL/anchor decode + NMS — as
one jitted program, batch 32, bf16 compute, on whatever single device JAX
exposes. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    from yolosharp_tpu.nn import ArchCfg, YoloNet
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference

    batch = 32
    imgsz = 640
    cfg = ArchCfg(version="v8", size="s", task="detect", nc=80,
                  end2end=False)
    net = YoloNet(cfg)

    key = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(key, (batch, imgsz, imgsz, 3), jnp.float32)
    variables = net.init(key, x32[:1], False)

    @jax.jit
    def predict(variables, images):
        preds = net.apply(variables, images.astype(jnp.bfloat16), False)
        dec = decode_inference(preds["one2many"], nc=80)
        out = non_max_suppression(dec, 0.25, 0.45, nc=80)
        # scalar checksum: forces full execution even on backends where
        # block_until_ready is unreliable (tunneled platforms)
        return out.scores.sum()

    # compile + warmup
    float(predict(variables, x32))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        s = predict(variables, x32)
    float(s)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    print(json.dumps({
        "metric": "images/sec/chip YOLOv8s-640 predict (batch 32, bf16, incl. NMS)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
