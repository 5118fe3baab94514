"""FastBN == flax nn.BatchNorm (f32): outputs, batch_stats, gradients.

FastBN (nn/common.py) replaces flax's BatchNorm on the train path to
avoid the float32 materialization of the normalize chain (the measured
25.7%+9.2% copy/pad share of the v12x E2E OBB train step). Its contract:
identical param/batch_stats tree AND identical f32 numerics up to
reassociation (it applies x*k + (bias - mean*k) instead of
(x - mean)*mul + bias).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from yolosharp_tpu.nn.common import FastBN


class _Flax(nn.Module):
    axis: int = -1

    @nn.compact
    def __call__(self, x, use_running_average):
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=0.97, epsilon=1e-3, dtype=x.dtype,
                            name="bn", axis=self.axis)(x)


class _Fast(nn.Module):
    axis: int = -1

    @nn.compact
    def __call__(self, x, use_running_average):
        return FastBN(name="bn", axis=self.axis)(x, use_running_average)


@pytest.mark.parametrize("axis", [-1, -2])
def test_fastbn_matches_flax_f32(axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, (2, 8, 8, 5, 4)), jnp.float32)
    ref, fast = _Flax(axis=axis), _Fast(axis=axis)
    v_ref = ref.init(jax.random.PRNGKey(0), x, True)
    v_fast = fast.init(jax.random.PRNGKey(0), x, True)
    # identical variable trees (paths AND shapes/dtypes)
    fr = jax.tree_util.tree_leaves_with_path(v_ref)
    ff = jax.tree_util.tree_leaves_with_path(v_fast)
    assert [(jax.tree_util.keystr(p), l.shape, l.dtype) for p, l in fr] \
        == [(jax.tree_util.keystr(p), l.shape, l.dtype) for p, l in ff]

    # non-trivial scale/bias/running stats
    c = x.shape[axis]
    params = {"bn": {"scale": jnp.asarray(rng.uniform(0.5, 2, c),
                                          jnp.float32),
                     "bias": jnp.asarray(rng.normal(0, 1, c), jnp.float32)}}
    stats = {"bn": {"mean": jnp.asarray(rng.normal(0, 1, c), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2, c),
                                       jnp.float32)}}

    # train mode: output + updated running stats + input/param grads
    def run(mod):
        def loss(p, xx):
            y, upd = mod.apply({"params": p, "batch_stats": stats}, xx,
                               False, mutable=["batch_stats"])
            return jnp.sum(y * y), (y, upd["batch_stats"])
        (l, (y, st)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(params, x)
        return l, y, st, g

    l0, y0, st0, g0 = run(ref)
    l1, y1, st1, g1 = run(fast)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(st0),
                         jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p))
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(g0),
                         jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(p))

    # eval mode: running-stat normalize
    ye0 = ref.apply({"params": params, "batch_stats": stats}, x, True)
    ye1 = fast.apply({"params": params, "batch_stats": stats}, x, True)
    np.testing.assert_allclose(np.asarray(ye1), np.asarray(ye0),
                               rtol=1e-5, atol=1e-5)


def test_fastbn_bf16_no_f32_output():
    """bf16 input -> bf16 output with f32 stats (the point of the module),
    and values track the f32 reference within bf16 resolution."""
    rng = np.random.default_rng(1)
    xf = rng.normal(0.5, 1.0, (4, 16, 16, 8)).astype(np.float32)
    fast = _Fast()
    v = fast.init(jax.random.PRNGKey(0), jnp.asarray(xf), True)
    y_bf, upd = fast.apply(v, jnp.asarray(xf, jnp.bfloat16), False,
                           mutable=["batch_stats"])
    assert y_bf.dtype == jnp.bfloat16
    for leaf in jax.tree_util.tree_leaves(upd):
        assert leaf.dtype == jnp.float32
    y_f32, _ = fast.apply(v, jnp.asarray(xf), False,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_bf, np.float32),
                               np.asarray(y_f32), rtol=0.03, atol=0.03)
