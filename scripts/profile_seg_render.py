"""xprof attribution for the PRODUCTION v11m-seg device-render train step.

Round-5 paired measurement (perf_family_packed seg): the device-render
seg step runs ~109 ms vs ~40 ms for the host-images step of the same
model — the mosaic render (images + per-instance masks) costs more than
the whole model fwd+bwd. This traces one production step (real
coco128-seg batch through YoloDataset.device_batch) and prints the
hlo_stats attribution so the render sink is named before it's attacked.

Usage: python scripts/profile_seg_render.py [trace_dir]
"""

from __future__ import annotations

import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

BATCH = 8


def summarize(trace_dir):
    from xprof.convert import raw_to_tool_data as rtd

    xs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                   recursive=True)
    xs.sort(key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", {})
    s = data.decode() if isinstance(data, bytes) else data
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
        top.append((t, vals[2], vals[3], vals[5][:90]))
    print(f"total device self time: {total/1e3:.2f} ms (1 step)")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {cat:32s} {t/1e3:8.2f} ms  {t/total:5.1%}")
    print("--- top 25 ops ---")
    for t, cat, name, fw in sorted(top, reverse=True)[:25]:
        print(f"  {t/1e3:6.2f} ms  {cat:22s} {name:26s} {fw}")


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_seg_render"
    from perf_family_packed import build, make_step

    task, cfg, state, batch, loss_fn = build("seg")
    step = make_step(task, cfg, loss_fn, 2)
    st, loss, _ = step(state, batch, {})
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(5):
        st, loss, _ = step(st, batch, {})
    float(loss)
    dt = (time.perf_counter() - t0) / 5
    print(f"seg device-render step: {dt*1e3:.2f} ms/step "
          f"{BATCH/dt:.1f} img/s", flush=True)

    jax.profiler.start_trace(trace_dir)
    st, loss, _ = step(st, batch, {})
    float(loss)
    jax.profiler.stop_trace()
    print("trace written to", trace_dir, flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
