"""Round-3 perf experiments on the calibrated bench workload (real chip).

Every experiment is measured INTERLEAVED with the control (seldec bf16
default) in the same process: the tunnel/chip ambient band is wider than
the effects under test (ROUND_NOTES round 3), so only paired deltas are
trustworthy. Timing = bench.py's on-device scan (one dispatch / 10 iters).

Experiments:
  ctrl        current default (select-then-decode, pre_topk 512)
  lhs         compiler option xla_tpu_enable_latency_hiding_scheduler
  vmem32/64   compiler option xla_tpu_scoped_vmem_limit_kib = 32768/65536
  autolayout  jit with in_shardings=Format(Layout.AUTO) for the image and
              device_put x into the compiler-preferred layout — removes
              the input relayout copy (xprof: 0.86 ms) from the program;
              honest because a host->device transfer can write any layout
              at equal cost, so serving would store this layout directly
  b64         batch 64 with seldec (round-2's b64 loss predates seldec)
  hosts2d     input prepacked to (B, 320, 320, 12) space-to-depth ON THE
              HOST (a reshape/transpose that rides the existing letterbox
              pass); stem runs as the exact stride-1 2x2 repack — the
              in-graph s2d transpose that made BENCH_S2D a 7% loss is gone

Usage: python scripts/perf_experiments_r3.py [names...]   (default: all)
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

from bench import BATCH, GFLOPS_PER_IMG, ITERS, PEAK_TFLOPS, \
    build_calibrated_v8s
from yolosharp_tpu.nn import (fused_inference, pallas_conv,
                              s2d_packed_input, s2d_stride2)
from yolosharp_tpu.nn.common import host_space_to_depth2, repack_s2d_kernel
from yolosharp_tpu.ops.nms import non_max_suppression
from yolosharp_tpu.predict import decode_inference_topk


def predict_body(net, v, im, *, s2d=0, packed=False):
    with fused_inference(), pallas_conv(False), s2d_stride2(s2d), \
            s2d_packed_input(packed):
        preds = net.apply(v, im, False)
    dec, trunc = decode_inference_topk(preds["one2many"], nc=80,
                                       conf_thres=0.25, k=512)
    out = non_max_suppression(dec, 0.25, 0.45, nc=80)
    return out._replace(truncated=out.truncated | trunc)


def make_run(net, *, s2d=0, packed=False, compiler_options=None,
             in_fmt=None):
    def run_impl(v, im):
        def step(carry, _):
            out = predict_body(net, v, im + carry.astype(im.dtype) * 1e-12,
                               s2d=s2d, packed=packed)
            return out.scores.sum().astype(jnp.float32), out.truncated.any()

        chk, trunc = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
        return chk, trunc.any()

    kw = {}
    if compiler_options:
        kw["compiler_options"] = compiler_options
    if in_fmt is not None:
        kw["in_shardings"] = in_fmt
    return jax.jit(run_impl, **kw)


def measure(run, v, im, batch):
    chk, trunc = run(v, im)
    float(chk)
    assert not bool(trunc), "candidate pool overflowed — not exact NMS"
    t0 = time.perf_counter()
    chk, _ = run(v, im)
    float(chk)
    dt = (time.perf_counter() - t0) / ITERS
    ips = batch / dt
    return dt, ips


def report(name, dt, ips, ctrl_ips):
    mfu = ips * GFLOPS_PER_IMG / 1e3 / PEAK_TFLOPS
    print(f"{name:12s}: {dt*1e3:7.2f} ms/batch  {ips:8.1f} img/s  "
          f"MFU={mfu*100:5.2f}%  vs paired ctrl {ips/ctrl_ips:+.1%}",
          flush=True)


def main():
    want = set(sys.argv[1:]) or {"lhs", "vmem32", "vmem64", "combo32",
                                 "combo64", "autolayout", "b64", "hosts2d"}
    key = jax.random.PRNGKey(0)
    net, variables, fused_vars, x, n_cand = build_calibrated_v8s(key)
    print(f"calibrated workload: ~{n_cand} candidates/img", flush=True)

    ctrl = make_run(net)

    def paired(name, run, v=None, im=None, batch=BATCH):
        """ctrl, exp, ctrl, exp — report exp vs mean of bracketing ctrls."""
        v = fused_vars if v is None else v
        im = x if im is None else im
        c1 = measure(ctrl, fused_vars, x, BATCH)
        e1 = measure(run, v, im, batch)
        c2 = measure(ctrl, fused_vars, x, BATCH)
        e2 = measure(run, v, im, batch)
        ctrl_ips = (c1[1] + c2[1]) / 2
        print(f"  [ctrl pair: {c1[1]:.1f} / {c2[1]:.1f} img/s]", flush=True)
        report(name + "/1", *e1, ctrl_ips)
        report(name + "/2", *e2, ctrl_ips)

    # warm the control once so compile time never lands inside a pair
    measure(ctrl, fused_vars, x, BATCH)

    if "lhs" in want:
        try:
            run = make_run(net, compiler_options={
                "xla_tpu_enable_latency_hiding_scheduler": "true"})
            paired("lhs", run)
        except Exception as e:
            print(f"lhs: UNSUPPORTED ({type(e).__name__}: {e})", flush=True)

    for name, kib in (("vmem32", "32768"), ("vmem64", "65536")):
        if name not in want:
            continue
        try:
            run = make_run(net, compiler_options={
                "xla_tpu_scoped_vmem_limit_kib": kib})
            paired(name, run)
        except Exception as e:
            print(f"{name}: UNSUPPORTED ({type(e).__name__}: {e})",
                  flush=True)

    # both measured-positive options together (lhs ~+2.5%, vmem ~+1.3%)
    for name, kib in (("combo32", "32768"), ("combo64", "65536")):
        if name not in want:
            continue
        try:
            run = make_run(net, compiler_options={
                "xla_tpu_enable_latency_hiding_scheduler": "true",
                "xla_tpu_scoped_vmem_limit_kib": kib})
            paired(name, run)
        except Exception as e:
            print(f"{name}: UNSUPPORTED ({type(e).__name__}: {e})",
                  flush=True)

    if "fulls2d" in want:
        # full predict on the HOST-packed input (stem = exact stride-1
        # repacked conv, no in-graph transpose); also stacked with the
        # measured-positive combo64 compiler options
        xp = jnp.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                         jnp.bfloat16)
        run = make_run(net, packed=True)
        paired("fulls2d", run, im=xp)
        run = make_run(net, packed=True, compiler_options={
            "xla_tpu_enable_latency_hiding_scheduler": "true",
            "xla_tpu_scoped_vmem_limit_kib": "65536"})
        paired("fulls2d+c64", run, im=xp)

    if "shootout" in want:
        # the three candidate production configs, 4 pairs each, ABAB
        xp = jnp.asarray(host_space_to_depth2(np.asarray(x, np.float32)),
                         jnp.bfloat16)
        c64opts = {"xla_tpu_enable_latency_hiding_scheduler": "true",
                   "xla_tpu_scoped_vmem_limit_kib": "65536"}
        cands = [
            ("c64", make_run(net, compiler_options=c64opts), fused_vars, x),
            ("fulls2d", make_run(net, packed=True), fused_vars, xp),
            ("fulls2d+c64", make_run(net, packed=True,
                                     compiler_options=c64opts),
             fused_vars, xp),
        ]
        for rep in range(4):
            for name, run, v, im in cands:
                c = measure(ctrl, fused_vars, x, BATCH)
                e = measure(run, v, im, BATCH)
                print(f"  shootout[{rep}] ctrl {c[1]:7.1f} | {name:12s} "
                      f"{e[1]:7.1f} img/s  ({e[1]/c[1]:+.1%})", flush=True)

    if "autolayout" in want:
        try:
            from jax.experimental.layout import Format, Layout
            auto = Format(Layout.AUTO)
            run = make_run(net, in_fmt=auto)
            compiled = run.lower(fused_vars, x).compile()
            v_fmt, x_fmt = compiled.input_formats[0]
            print(f"  compiler-preferred image layout: {x_fmt}", flush=True)
            v_opt = jax.device_put(jax.device_get(fused_vars), v_fmt)
            x_opt = jax.device_put(np.asarray(x), x_fmt)
            paired("autolayout", compiled, v=v_opt, im=x_opt)
        except Exception as e:
            print(f"autolayout: FAILED ({type(e).__name__}: {e})", flush=True)

    if "b64" in want:
        x64 = jnp.concatenate([x, x[::-1]], axis=0)
        run = make_run(net)
        paired("b64", run, im=x64, batch=64)

    if "hosts2d" in want:
        # exact host-side 2x2 space-to-depth of the input; stem conv runs
        # on the repacked kernel with NO in-graph transpose
        xs2d = np.asarray(x, np.float32).reshape(BATCH, 320, 2, 320, 2, 3)
        xs2d = xs2d.transpose(0, 1, 3, 2, 4, 5).reshape(BATCH, 320, 320, 12)
        xs2d = jnp.asarray(xs2d, jnp.bfloat16)

        # Stem-only probe first: if the host-packed stem doesn't beat the
        # plain stride-2 stem standalone, plumbing packed input through
        # the full net can't win either (the rest of the graph is
        # identical from the stem output on).
        stem_scope = "0"
        params = dict(fused_vars["params"])
        assert stem_scope in params, sorted(params)[:5]
        stem = jax.tree_util.tree_map(np.asarray, params[stem_scope])
        leaves = {}

        def walk(d, pfx=""):
            for kk, vv in d.items():
                if isinstance(vv, dict):
                    walk(vv, pfx + kk + "/")
                else:
                    leaves[pfx + kk] = vv
        walk(stem)
        print(f"  stem params: { {k: v.shape for k, v in leaves.items()} }",
              flush=True)
        k = next(v for n, v in leaves.items() if n.endswith("kernel"))
        b = next(v for n, v in leaves.items() if n.endswith("bias"))
        keff = np.asarray(repack_s2d_kernel(jnp.asarray(k, jnp.float32)))

        def stem_plain(im):
            y = jax.lax.conv_general_dilated(
                im, jnp.asarray(k, jnp.bfloat16), (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.silu(y + jnp.asarray(b, jnp.bfloat16))

        def stem_s2d(im):
            y = jax.lax.conv_general_dilated(
                im, jnp.asarray(keff, jnp.bfloat16), (1, 1),
                [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.silu(y + jnp.asarray(b, jnp.bfloat16))

        def scan_time(fn, im):
            @jax.jit
            def run(im):
                def step(c, _):
                    return jnp.sum(fn(im + c.astype(im.dtype) * 1e-12)
                                   ).astype(jnp.float32), ()
                chk, _ = jax.lax.scan(step, jnp.float32(0.0), None,
                                      length=50)
                return chk
            float(run(im))
            t0 = time.perf_counter()
            float(run(im))
            return (time.perf_counter() - t0) / 50

        # parity first
        yp = np.asarray(jax.jit(stem_plain)(x[:2]), np.float32)
        ys = np.asarray(jax.jit(stem_s2d)(xs2d[:2]), np.float32)
        err = np.abs(yp - ys).max()
        print(f"  hosts2d stem parity max-abs: {err:.3e}", flush=True)
        tp = scan_time(stem_plain, x)
        ts = scan_time(stem_s2d, xs2d)
        print(f"hosts2d stem-only: plain {tp*1e3:.3f} ms vs host-s2d "
              f"{ts*1e3:.3f} ms ({tp/ts:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
