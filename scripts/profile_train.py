"""Train-step attribution on the real chip: batch sweep + xprof trace.

The v8n-320 b16 train step measured ~15.5 ms ≈ 3.4% MFU
(perf_train_tuning.py) — far below the predict path's 24%. This script
answers (a) does throughput scale with batch (occupancy-bound) and
(b) where the time goes (hlo_stats over an xprof trace: convs vs TAL
assigner vs optimizer), so the next optimization round aims at the
actual sink.

Usage: python scripts/profile_train.py [trace_dir=/tmp/xprof_train]
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
    # batch sweep: same model, b16/b32/b64 (n-labels fixed at 16)
    for b in (16, 32, 64):
        T.BATCH = b
        net, state, batch = T.build()
        run = T.make_run(net)
        dt, ips = T.measure(run, state, batch)
        mfu = ips * T.GFLOPS_PER_IMG / 1e3 / T.PEAK_TFLOPS
        print(f"b{b:<3d}: {dt*1e3:6.2f} ms/step  {ips:7.1f} img/s  "
              f"~{mfu*100:.1f}% MFU", flush=True)

    # xprof trace of the b16 step (the protocol batch size)
    T.BATCH = 16
    net, state, batch = T.build()
    run = T.make_run(net)
    float(run(state, batch))            # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    float(run(state, batch))
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir}", flush=True)

    # hlo_stats attribution (same recipe as profile_predict.py)
    try:
        from xprof.convert import raw_to_tool_data as rtd

        xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
        xs.sort(key=os.path.getmtime)
        data, _ = rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", {})
        import csv
        import io

        rows = list(csv.reader(io.StringIO(
            data.decode() if isinstance(data, bytes) else data)))
        head = rows[0]
        ti = next((i for i, h in enumerate(head)
                   if "total time" in h.lower()), None)
        if ti is None:
            print("columns:", head)
            return
        cat_i = next((i for i, h in enumerate(head)
                      if "category" in h.lower()), None)
        by_cat = {}
        total = 0.0
        for r in rows[1:]:
            try:
                t = float(r[ti])
            except (ValueError, IndexError):
                continue
            total += t
            cat = r[cat_i] if cat_i is not None else "?"
            by_cat[cat] = by_cat.get(cat, 0.0) + t
        print(f"total device time: {total/1e3:.2f} ms")
        for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:14]:
            print(f"  {cat:40s} {t/1e3:8.2f} ms  {t/total:5.1%}")
    except Exception as e:
        print(f"hlo_stats unavailable ({type(e).__name__}: {e}); "
              f"inspect {trace_dir} with tensorboard/xprof manually")


if __name__ == "__main__":
    main()
