"""xprof attribution of the v8s-640 predict graph: top HLO ops by time.

Captures a jax.profiler trace of the bench.py program (same calibrated
workload) and prints the top-N ops from xprof's hlo_stats — the tool that
attributed the round-2 early-conv layout sink (stem 2.0 ms + conv1 1.6 ms
+ l2-cv2 3.3 ms of a 20 ms batch; docs/ROUND_NOTES.md). Use it to verify
graph-transform effects (s2d stem rewrite, int8) mechanistically.

Usage: python scripts/profile_predict.py [trace_dir=/tmp/xprof_predict]
Env:   BENCH_S2D (default 3), BENCH_INT8 (default 0)
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_predict"
    s2d = int(os.environ.get("BENCH_S2D", "3"))
    int8 = os.environ.get("BENCH_INT8", "0") == "1"

    from bench import build_calibrated_v8s
    from yolosharp_tpu.nn import (fused_inference, pallas_conv,
                                  quant_calibrate, quant_int8, s2d_stride2)
    from yolosharp_tpu.ops.nms import non_max_suppression
    from yolosharp_tpu.predict import decode_inference

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

    @jax.jit
    def predict(v, im):
        with fused_inference(), pallas_conv(False), s2d_stride2(s2d), \
                quant_int8(int8):
            preds = net.apply(v, im, False)
        dec = decode_inference(preds["one2many"], nc=80)
        return non_max_suppression(dec, 0.25, 0.45, nc=80, pre_topk=512)

    out = predict(variables, x)          # compile
    float(out.scores.sum())
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = predict(variables, x)
    float(out.scores.sum())
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir} (config: s2d={s2d} int8={int8}, "
          f"~{n_cand} cand/img)")

    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        print("no xplane.pb found"); return
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        print("xprof not installed; open the trace in TensorBoard"); return
    data, _ = raw_to_tool_data.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    import csv
    import io

    rows = list(csv.reader(io.StringIO(data.decode()
                                       if isinstance(data, bytes) else data)))
    hdr = rows[0]
    try:
        ti = hdr.index("Total time (us)")
    except ValueError:
        ti = len(hdr) - 1
    body = sorted(rows[1:], key=lambda r: -float(r[ti] or 0))
    print(f"{'us':>10}  op")
    for r in body[:25]:
        name = (r[2] if len(r) > 2 else r[0])[:110]
        print(f"{float(r[ti]):>10.1f}  {name}")


if __name__ == "__main__":
    main()
