"""Perf probe: decompose YOLOv8s-640 predict time on the real chip.

Steady-state timing via an on-device lax.scan of N iterations (single
dispatch — immune to tunnel per-call latency). The input is perturbed by
the previous iteration's checksum so XLA cannot CSE the loop body.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from yolosharp_tpu.nn import ArchCfg, YoloNet
from yolosharp_tpu.ops.nms import non_max_suppression
from yolosharp_tpu.predict import decode_inference

GFLOPS_PER_IMG = 28.6  # Ultralytics v8s-640 fwd
PEAK_TFLOPS = 197.0    # v5e bf16
N_ITERS = 10


def scan_bench(body, x):
    """Time N_ITERS executions of body inside one jitted scan."""

    @jax.jit
    def run(x):
        def step(carry, _):
            out = body(x + carry.astype(x.dtype) * 1e-12)
            chk = jnp.sum(out).astype(jnp.float32)
            return chk, ()

        chk, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=N_ITERS)
        return chk

    float(run(x))  # compile + warmup
    t0 = time.perf_counter()
    r = run(x)
    float(r)
    return (time.perf_counter() - t0) / N_ITERS


def main():
    cfg = ArchCfg(version="v8", size="s", task="detect", nc=80, end2end=False)
    net = YoloNet(cfg)
    key = jax.random.PRNGKey(0)
    variables = net.init(key, jnp.zeros((1, 640, 640, 3), jnp.float32), False)

    for batch in (32, 64):
        x = jax.random.uniform(key, (batch, 640, 640, 3), jnp.bfloat16)

        def fwd(im):
            return net.apply(variables, im, False)["one2many"]["cls"][0]

        def fwd_dec(im):
            p = net.apply(variables, im, False)
            return decode_inference(p["one2many"], nc=80)

        def full(im):
            p = net.apply(variables, im, False)
            dec = decode_inference(p["one2many"], nc=80)
            return non_max_suppression(dec, 0.25, 0.45, nc=80,
                                       pre_topk=2048).scores

        def full_exact(im):
            p = net.apply(variables, im, False)
            dec = decode_inference(p["one2many"], nc=80)
            return non_max_suppression(dec, 0.25, 0.45, nc=80).scores

        for name, fn in (("fwd", fwd), ("fwd+dec", fwd_dec),
                         ("fwd+dec+nms2048", full),
                         ("fwd+dec+nmsexact", full_exact)):
            dt = scan_bench(fn, x)
            ips = batch / dt
            mfu = ips * GFLOPS_PER_IMG / 1e3 / PEAK_TFLOPS
            print(f"b{batch:3d} {name:16s}: {dt*1e3:8.2f} ms  "
                  f"{ips:8.1f} img/s  MFU={mfu*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
