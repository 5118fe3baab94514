"""Pallas fused-attention kernel vs the einsum reference formulation.

On CPU the kernel runs in interpret mode (numerics identical to compiled);
the TPU-compiled path is exercised by bench/TPU runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolosharp_tpu.kernels.attention import fused_attention


def _einsum_ref(q, k, v, scale):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(jnp.float32))


@pytest.mark.parametrize("b,h,n,d", [(2, 1, 400, 32), (1, 2, 100, 64),
                                     (1, 1, 300, 32)])
def test_fused_attention_matches_einsum(b, h, n, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, n, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, n, d), jnp.float32)
    scale = d ** -0.5
    got = fused_attention(q, k, v, scale=scale, block_rows=128,
                          interpret=True)
    want = _einsum_ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_custom_vjp_matches_autodiff():
    """The hand-written backward (used with the Pallas forward on TPU) must
    match jax.grad through the einsum formulation."""
    from yolosharp_tpu.kernels.attention import (_einsum_attention,
                                                 _pallas_attn_bwd)

    key = jax.random.PRNGKey(3)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, n, h, d = 2, 50, 2, 32
    q = jax.random.normal(kq, (b, n, h, d))
    k = jax.random.normal(kk, (b, n, h, d))
    v = jax.random.normal(kv, (b, n, h, d))
    g = jax.random.normal(kg, (b, n, h, d))
    scale = d ** -0.5

    def f(q, k, v):
        return (_einsum_attention(q, k, v, scale) * g).sum()

    dq_want, dk_want, dv_want = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = _pallas_attn_bwd(scale, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_want),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_row_padding():
    # n not a multiple of block_rows exercises the pad/crop path
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 1, 130, 32), jnp.float32)
    got = fused_attention(q, q, q, scale=0.2, block_rows=64, interpret=True)
    want = _einsum_ref(q, q, q, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
