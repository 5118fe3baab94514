"""im-copy attack #3 (VERDICT r4 #4b): donate the input buffer.

xprof attributes 0.88 ms/batch of the packed-deeper predict program to an
`im:` input re-tiling copy; the layout-AUTO probe (r4) showed feeding the
compiler-preferred layout does NOT remove it. This probe measures whether
donating the input buffer (jax donate_argnums — lets XLA alias the
argument's memory for scratch/output) changes anything, using per-call
dispatch on a fresh device_put each iteration (the serving pattern), with
a paired non-donated control.

Usage: python scripts/perf_donate_probe.py [pairs=3]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                + "/")
import bench  # the calibrated honest workload builder  # noqa: E402

BATCH, ITERS = 32, 20


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from yolosharp_tpu.nn import fused_inference, host_space_to_depth2
    from yolosharp_tpu.nn.common import s2d_packed_input
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference_topk

    key = jax.random.PRNGKey(0)
    net, variables, fused_vars, x, n_cand = bench.build_calibrated_v8s(key)
    xp_host = np.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                         np.float32).astype(jnp.bfloat16)

    def predict(v, im):
        with fused_inference(), s2d_packed_input(True, deep=True, deeper=1):
            preds = net.apply(v, im, False)
        dec, trunc = decode_inference_topk(preds["one2many"], nc=80,
                                           conf_thres=0.25, k=512)
        out = non_max_suppression(dec, 0.25, 0.45, nc=80)
        return out.scores.sum().astype(jnp.float32)

    run_plain = jax.jit(predict)
    run_donate = jax.jit(predict, donate_argnums=(1,))

    def measure(run):
        # serving pattern: fresh H2D put per call, per-call dispatch
        s = float(run(fused_vars, jax.device_put(jnp.asarray(xp_host))))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            im = jax.device_put(jnp.asarray(xp_host))
            s = run(fused_vars, im)
        float(s)
        return (time.perf_counter() - t0) / ITERS

    for p in range(pairs):
        d_plain = measure(run_plain)
        d_don = measure(run_donate)
        print(f"pair {p}: plain={d_plain*1e3:.2f} ms "
              f"donate={d_don*1e3:.2f} ms "
              f"({BATCH/d_plain:.1f} vs {BATCH/d_don:.1f} img/s, "
              f"{(d_plain/d_don-1)*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
