"""Pallas TPU kernel: fused area/PSA self-attention.

The v12 area-attention (Block.cs AAttn:1029-1118) and v11 PSA attention
materialize an (N, N) score matrix in HBM through separate matmul/softmax/
matmul ops. This kernel fuses QK^T -> softmax -> PV per (batch, head, row-
block): scores live only in VMEM, halving HBM traffic for the hot attention
stage. Sequence lengths here are short (<= 80*80 at P3, 400 per area chunk
in v12), so each row-block sees the FULL key range — no online-softmax
bookkeeping is needed, just row-block tiling.

Layout contract: q, k, v are (B, H, N, D) with D in {16,32,64,128} and N a
multiple of the row block (wrapper pads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)            # (Br, D)
    k = k_ref[0].astype(jnp.float32)            # (N, D)
    v = v_ref[0].astype(jnp.float32)            # (N, D)
    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (Br, N)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_rows",
                                             "interpret"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    *, scale: float, block_rows: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q @ k^T * scale) @ v over (B, H, N, D) tensors."""
    b, h, n, d = q.shape
    br = min(block_rows, n)
    pad = (-n) % br
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    npad = n + pad

    bh = b * h
    qf = q.reshape(bh, npad, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)

    grid = (bh, npad // br)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, br, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, npad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * npad * n * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=bh * npad * n,
        ),
    )(qf, kf, vf)
    out = out.reshape(b, h, npad, d)
    return out[:, :, :n] if pad else out


def _einsum_attention(q, k, v, scale):
    """XLA reference formulation over (B, N, H, D)."""
    attn = jnp.einsum("bihd,bjhd->bhij", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bjhd->bihd", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention_bihd(q, k, v, scale):
    o = fused_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                        v.transpose(0, 2, 1, 3), scale=scale)
    return o.transpose(0, 2, 1, 3)


def _pallas_attn_fwd(q, k, v, scale):
    return _pallas_attention_bihd(q, k, v, scale), (q, k, v)


def _pallas_attn_bwd(scale, res, g):
    """Backward recomputes P via einsum (cheap at these sequence lengths);
    standard softmax-attention gradients."""
    q, k, v = res
    s = jnp.einsum("bihd,bjhd->bhij", q * scale, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhij,bihd->bjhd", p, g32)
    dp = jnp.einsum("bihd,bjhd->bhij", g32, v32)
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    dq = scale * jnp.einsum("bhij,bjhd->bihd", ds, k.astype(jnp.float32))
    dk = scale * jnp.einsum("bhij,bihd->bjhd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_pallas_attention_bihd.defvjp(_pallas_attn_fwd, _pallas_attn_bwd)


def attention_bihd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, use_pallas: bool = True) -> jnp.ndarray:
    """(B, N, H, D)-layout wrapper used by the nn attention modules.

    Pallas forward on TPU with a custom VJP (backward recomputes scores via
    einsum); falls back to the einsum formulation off-TPU (Pallas interpret
    mode is too slow for production CPU use, and XLA's fusion is fine there).
    """
    if use_pallas and jax.default_backend() == "tpu":
        return _pallas_attention_bihd(q, k, v, scale)
    return _einsum_attention(q, k, v, scale)
