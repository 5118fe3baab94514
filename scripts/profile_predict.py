"""xprof attribution of the v8s-640 predict graph: top HLO ops by time.

Captures a jax.profiler trace of the bench.py program (same calibrated
workload, select-then-decode path) and prints hlo_stats aggregated by
category plus the top ops — the tool that attributed the round-2
early-conv layout sink (stem 2.0 ms + conv1 1.6 ms + l2-cv2 3.3 ms of a
20 ms batch; docs/ROUND_NOTES.md). Use it to verify graph-transform
effects (host-packed s2d input, int8) mechanistically.

Usage: python scripts/profile_predict.py [trace_dir=/tmp/xprof_predict]
Env:   BENCH_PACKED (default 1: host-packed s2d input),
       BENCH_S2D (default 0: in-graph rewrite), BENCH_INT8 (default 0)
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_predict"
    s2d = int(os.environ.get("BENCH_S2D", "0"))
    packed = os.environ.get("BENCH_PACKED", "1") == "1"
    deep = os.environ.get("BENCH_DEEP", "1") == "1"
    deeper = os.environ.get("BENCH_DEEPER", "1") == "1"
    int8 = os.environ.get("BENCH_INT8", "0") == "1"

    from bench import build_calibrated_v8s
    from yolosharp_tpu.nn import (fused_inference, host_space_to_depth2,
                                  pallas_conv, quant_calibrate, quant_int8,
                                  s2d_packed_input, s2d_stride2)
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference_topk

    net, _, fused_vars, x, n_cand = build_calibrated_v8s(jax.random.PRNGKey(0))
    variables = fused_vars
    if int8:
        @jax.jit
        def cal(v, im):
            with fused_inference(), s2d_stride2(s2d), quant_calibrate():
                return net.apply(v, im, False, mutable=["quant_stats"])

        _, upd = cal(fused_vars, x[:8])
        variables = jax.device_put(
            {**fused_vars, "quant_stats": jax.device_get(upd["quant_stats"])})
    if packed:
        x = jnp.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                        jnp.bfloat16)

    @jax.jit
    def predict(v, im):
        with fused_inference(), pallas_conv(False), s2d_stride2(s2d), \
                quant_int8(int8), s2d_packed_input(packed, deep=deep,
                                                   deeper=deeper):
            preds = net.apply(v, im, False)
        dec, trunc = decode_inference_topk(preds["one2many"], nc=80,
                                           conf_thres=0.25, k=512)
        out = non_max_suppression(dec, 0.25, 0.45, nc=80)
        return out._replace(truncated=out.truncated | trunc)

    out = predict(variables, x)          # compile
    float(out.scores.sum())
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = predict(variables, x)
    float(out.scores.sum())
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir} (config: packed={packed} s2d={s2d} "
          f"deep={deep} deeper={deeper} int8={int8}, ~{n_cand} cand/img, "
          f"3 batches)")

    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        print("no xplane.pb found"); return
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        print("xprof not installed; open the trace in TensorBoard"); return
    data, _ = rtd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    s = data.decode() if isinstance(data, bytes) else data
    # gviz-JSON rows; fields by position: 2=category, 3=op name,
    # 5=framework op, 9=total self time (us)
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
        top.append((t, vals[2], vals[3], vals[5][:70]))
    print(f"total device self time: {total/1e3:.2f} ms (3 batches)")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {cat:32s} {t/1e3:8.2f} ms  {t/total:5.1%}")
    print("--- top ops ---")
    for t, cat, name, fw in sorted(top, reverse=True)[:20]:
        print(f"  {t/1e3:6.2f} ms  {cat:22s} {name:26s} {fw}")


if __name__ == "__main__":
    main()
