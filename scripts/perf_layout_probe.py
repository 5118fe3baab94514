"""Probe: does feeding the packed input in the compiler-chosen layout
remove the measured `im:` input copy (~0.9 ms/batch, 6% of the deeper
predict program — xprof round 4)?

Compiles the bench predict with AUTO input layouts (jax.experimental.
layout.Format(Layout.AUTO)), queries the chosen input format, re-places
the input with jax.device_put(x, format), and paired-times default-layout
vs auto-layout dispatch of the SAME program. Prints both and the chosen
major_to_minor.

Usage: python scripts/perf_layout_probe.py
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
from jax.experimental.layout import Format, Layout

ITERS = 10


def main():
    from bench import build_calibrated_v8s
    from yolosharp_tpu.nn import (fused_inference, host_space_to_depth2,
                                  pallas_conv, s2d_packed_input, s2d_stride2)
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference_topk

    net, _, fused_vars, x, n_cand = build_calibrated_v8s(jax.random.PRNGKey(0))
    xp = jnp.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                     jnp.bfloat16)

    def predict(v, im):
        with fused_inference(), pallas_conv(False), s2d_stride2(0), \
                s2d_packed_input(True, deeper=1):
            preds = net.apply(v, im, False)
        dec, trunc = decode_inference_topk(preds["one2many"], nc=80,
                                           conf_thres=0.25, k=512)
        out = non_max_suppression(dec, 0.25, 0.45, nc=80)
        return out._replace(truncated=out.truncated | trunc)

    def scan_fn(v, im):
        def step(carry, _):
            out = predict(v, im + carry.astype(im.dtype) * 1e-12)
            return out.scores.sum().astype(jnp.float32), None

        chk, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
        return chk

    def timeit(fn, v, im):
        float(fn(v, im))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(v, im))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best

    base = jax.jit(scan_fn)
    dt0 = timeit(base, fused_vars, xp)
    print(f"default layout: {dt0 * 1e3:.2f} ms/batch "
          f"({xp.shape[0] / dt0:.1f} img/s)")

    auto = jax.jit(scan_fn, in_shardings=Format(Layout.AUTO))
    compiled = auto.lower(fused_vars, xp).compile()
    fmts = compiled.input_formats
    im_fmt = jax.tree_util.tree_leaves(fmts)[-1]  # (vars..., im)
    print("chosen im format:", im_fmt)
    flat_f = jax.tree_util.tree_leaves(fmts)
    flat_a, treedef = jax.tree_util.tree_flatten((fused_vars, xp))
    assert len(flat_f) == len(flat_a), (len(flat_f), len(flat_a))
    placed = [jax.device_put(a, f) if f.layout is not None else a
              for a, f in zip(flat_a, flat_f)]
    vars_auto, xp_auto = jax.tree_util.tree_unflatten(treedef, placed)
    dt1 = timeit(compiled, vars_auto, xp_auto)
    print(f"auto layout:    {dt1 * 1e3:.2f} ms/batch "
          f"({xp.shape[0] / dt1:.1f} img/s)  "
          f"delta {(dt0 - dt1) / dt0:+.1%}")


if __name__ == "__main__":
    main()
