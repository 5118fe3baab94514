"""Train-step attribution on the real chip: batch sweep + xprof trace.

The v8n-320 b16 train step measured ~15.5 ms ≈ 3.4% MFU
(perf_train_tuning.py) — far below the predict path's 24%. This script
answers (a) does throughput scale with batch (occupancy-bound) and
(b) where the time goes (hlo_stats over an xprof trace: convs vs TAL
assigner vs optimizer), so the next optimization round aims at the
actual sink.

Usage: python scripts/profile_train.py [trace_dir=/tmp/xprof_train]
Env: YS_RENDER=1 traces the PRODUCTION step (device-augment separable
     packed render fused in — the shipped defaults) instead of the
     host-images step; YS_IMGSZ sizes the workload (default 320).
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

import perf_train_tuning as T


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_train"
    render = os.environ.get("YS_RENDER", "0") == "1"
    kw = (dict(render=True, packed_render=True, separable=True,
               packed_depth=2)   # the shipped Config defaults
          if render else {})
    # batch sweep: same model, b16/b32/b64 (n-labels fixed at 16)
    for b in (16, 32, 64):
        T.BATCH = b
        net, state, batch = T.build(render=render)
        run = T.make_run(net, **kw)
        dt, ips = T.measure(run, state, batch)
        mfu = ips * T.GFLOPS_PER_IMG / 1e3 / T.PEAK_TFLOPS
        print(f"b{b:<3d}: {dt*1e3:6.2f} ms/step  {ips:7.1f} img/s  "
              f"~{mfu*100:.1f}% MFU", flush=True)

    # xprof trace of the b16 step (the protocol batch size)
    T.BATCH = 16
    net, state, batch = T.build(render=render)
    run = T.make_run(net, **kw)
    float(run(state, batch))            # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    float(run(state, batch))
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir}", flush=True)

    # hlo_stats attribution. This xprof emits gviz-JSON (not CSV); the row
    # fields by position: 2=category, 3=op name, 5=framework op,
    # 9=total self time (us).
    try:
        import re

        from xprof.convert import raw_to_tool_data as rtd

        xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
        xs.sort(key=os.path.getmtime)
        data, _ = rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", {})
        s = data.decode() if isinstance(data, bytes) else data
        by_cat, total, top = {}, 0.0, []
        for r in re.findall(r'\{"c":\[(.*?)\]\}', s):
            vals = [v.strip('"')
                    for v in re.findall(r'\{"v":(.*?)\}(?:,|$)', r)]
            if len(vals) < 10:
                continue
            try:
                t = float(vals[9])
            except ValueError:
                continue
            total += t
            by_cat[vals[2]] = by_cat.get(vals[2], 0.0) + t
            top.append((t, vals[2], vals[3], vals[5][:60]))
        print(f"total device self time: {total/1e3:.2f} ms "
              f"({T.ITERS} steps)")
        for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {cat:32s} {t/1e3:8.2f} ms  {t/total:5.1%}")
        print("--- top ops ---")
        for t, cat, name, fw in sorted(top, reverse=True)[:12]:
            print(f"  {t/1e3:6.2f} ms  {cat:22s} {name:24s} {fw}")
    except Exception as e:
        print(f"hlo_stats unavailable ({type(e).__name__}: {e}); "
              f"inspect {trace_dir} with tensorboard/xprof manually")


if __name__ == "__main__":
    main()
