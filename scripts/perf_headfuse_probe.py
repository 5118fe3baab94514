"""Paired interleaved A/B: head-tower first-conv fusion on the deeper
packed predict program (VERDICT r4 #4a decision probe).

Two one-shot bench.py runs disagreed on the sign (+2.6% / -0.6% same-run
each time, but opposite), so the default flip needs a real multi-pair
interleaved measurement in ONE process: deeper vs deeper+headfuse,
alternating, N pairs, on the calibrated honest workload.

Usage: python scripts/perf_headfuse_probe.py [pairs=4]
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

import bench  # noqa: E402

BATCH, ITERS = 32, 10


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from functools import partial

    from yolosharp_tpu.compile import predict_jit
    from yolosharp_tpu.nn import fused_inference, host_space_to_depth2
    from yolosharp_tpu.nn.common import head_fuse, s2d_packed_input
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference_topk

    key = jax.random.PRNGKey(0)
    net, variables, fused_vars, x, n_cand = bench.build_calibrated_v8s(key)
    xp = jnp.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                     jnp.bfloat16)
    print(f"workload: ~{n_cand} candidates/img", flush=True)

    def make(hf: bool):
        def predict(v, im):
            with fused_inference(), \
                    s2d_packed_input(True, deep=True, deeper=1), \
                    head_fuse(hf):
                preds = net.apply(v, im, False)
            dec, trunc = decode_inference_topk(preds["one2many"], nc=80,
                                               conf_thres=0.25, k=512)
            out = non_max_suppression(dec, 0.25, 0.45, nc=80)
            return out._replace(truncated=out.truncated | trunc)

        @partial(predict_jit, tune=False)
        def run(v, im):
            def step(carry, _):
                out = predict(v, im + carry.astype(im.dtype) * 1e-12)
                return out.scores.sum().astype(jnp.float32), out.truncated.any()
            chk, trunc = jax.lax.scan(step, jnp.float32(0.0), None,
                                      length=ITERS)
            return chk, trunc.any()
        return run

    runs = {False: make(False), True: make(True)}
    for hf, run in runs.items():
        chk, trunc = run(fused_vars, xp)        # compile + warm
        float(chk)
        assert not bool(trunc)

    for p in range(pairs):
        row = {}
        for hf in (False, True):
            t0 = time.perf_counter()
            chk, _ = runs[hf](fused_vars, xp)
            float(chk)
            row[hf] = (time.perf_counter() - t0) / ITERS
        print(f"pair {p}: deeper={BATCH/row[False]:.1f} img/s "
              f"headfuse={BATCH/row[True]:.1f} img/s "
              f"({(row[False]/row[True]-1)*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
