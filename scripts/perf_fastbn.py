"""FastBN vs flax BatchNorm: paired interleaved train-step measurement.

FastBN (nn/common.py) applies the BN normalize as x*k + b in the INPUT
dtype instead of flax's f32-promoted chain; xprof attribution
(profile_family.py obb) measured the f32 materialize + lane-pad copies
at 25.7%+9.2% of the v12x-640 E2E OBB train step. This script measures
the end-to-end effect on the family train steps, paired and interleaved
(the ambient band on this chip is wider than small effects).

ctrl = the same step traced under nn.common.flax_bn() (the old flax
path); fast = the shipped default. Both share one TrainState and batch.

Usage: python scripts/perf_fastbn.py [pairs=3] [families...]
Families: obb (v12x-640 E2E b4), seg (v11m-640 b8), pose (v11m-640 b8).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from profile_family import build  # noqa: E402

from yolosharp_tpu.nn.common import flax_bn  # noqa: E402


def measure(step_fn, state, batch, kwargs, reps=10, ctx=None):
    import contextlib
    with ctx() if ctx else contextlib.nullcontext():
        _, loss, _ = step_fn(state, batch, kwargs)   # compile + warm
        float(loss)
        t0 = time.perf_counter()
        for _ in range(reps):
            _, loss, _ = step_fn(state, batch, kwargs)
        float(loss)
        return (time.perf_counter() - t0) / reps


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fams = sys.argv[2:] or ["obb", "seg", "pose"]
    for which in fams:
        step_fast, state, batch, kwargs, b, mk = build(which)
        step_ctrl = mk()
        rows = []
        for i in range(pairs):
            dt_c = measure(step_ctrl, state, batch, kwargs, ctx=flax_bn)
            dt_f = measure(step_fast, state, batch, kwargs)
            rows.append((dt_c, dt_f))
            print(f"{which} pair {i}: ctrl(flax) {dt_c*1e3:.2f} ms  "
                  f"fast {dt_f*1e3:.2f} ms  "
                  f"speedup {dt_c/dt_f:.3f}x", flush=True)
        mc = sum(r[0] for r in rows) / len(rows)
        mf = sum(r[1] for r in rows) / len(rows)
        print(f"{which} MEAN: ctrl {mc*1e3:.2f} ms ({b/mc:.1f} img/s)  "
              f"fast {mf*1e3:.2f} ms ({b/mf:.1f} img/s)  "
              f"speedup {mc/mf:.3f}x", flush=True)


if __name__ == "__main__":
    main()
