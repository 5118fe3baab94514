"""TPU compiler tuning for the jitted predict programs.

Measured on TPU v5e with paired interleaved runs on the calibrated
v8s-640 batch-32 predict workload (scripts/perf_experiments_r3.py):
the latency-hiding scheduler is +2.5%, a 64 MiB scoped-VMEM limit +1.3%,
and the combination a consistent +2.2-2.4% (1682-1684 vs 1645 img/s
paired control). Options are per-program (jax.jit compiler_options), so
nothing leaks into training compiles, and they are skipped entirely on
non-TPU backends where the flags do not exist.
"""

from __future__ import annotations

import jax

# backend names that reach a real TPU compiler (the tunneled chip in this
# container registers as the experimental "axon" platform)
_TPU_BACKENDS = ("tpu", "axon")

PREDICT_TUNING = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    "xla_tpu_scoped_vmem_limit_kib": "65536",
}


def tpu_backend() -> bool:
    try:
        return jax.default_backend() in _TPU_BACKENDS
    except Exception:
        return False


def predict_jit(fn, *, tune: bool = True, **jit_kwargs):
    """jax.jit with the measured predict-path compiler options on TPU."""
    if tune and tpu_backend():
        jit_kwargs = dict(jit_kwargs, compiler_options=dict(PREDICT_TUNING))
    return jax.jit(fn, **jit_kwargs)
