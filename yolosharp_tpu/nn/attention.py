"""Attention blocks: PSA (v11), area-attention (v12), transformer (C3TR).

Functional parity targets: YoloSharp/Modules/Block.cs:664-1118 (C2PSA,
PSABlock, Attention, A2C2f, ABlock, AAttn) and Modules/Transformer.cs.

NHWC formulation: attention is expressed as einsums over (B, N, heads, dim)
tensors — XLA maps these straight onto the MXU; no NCHW permutes. Sequence
lengths are tiny (<= 80*80 at P3, 400 at v12-P5 per area), so flash-style
tiling is unnecessary; a fused Pallas kernel for AAttn is an optimization
hook in kernels/.

NOTE: the reference wraps qkv/proj/pe in its Conv block, which defaults to
SiLU activation (Convs.Conv, Convs.cs:44-62) — unlike Ultralytics where these
convs have act=False. We mirror the reference's behavior (parity target is
the C# implementation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import (C3k, ConvBN, torch_bias_init,
                     torch_linear_init)


class AttentionPSA(nn.Module):
    """Multi-head self-attention over the spatial map + positional conv.

    Block.cs:721-810 (AttentionType.SelfAttention path).
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        nh = self.num_heads
        hd = self.dim // nh
        kd = int(hd * self.attn_ratio)
        scale = kd ** -0.5

        qkv = ConvBN(self.dim + 2 * kd * nh, 1, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, nh, 2 * kd + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)

        from ..kernels import attention_bihd

        if kd == hd:
            out = attention_bihd(q, k, v, scale).reshape(b, h, w, c)
        else:
            # mixed key/value head dims (attn_ratio != 1): einsum path
            attn = jnp.einsum("bihd,bjhd->bhij", q * scale, k)
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(x.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, h, w, c)
        v_map = v.reshape(b, h, w, c)
        out = out + ConvBN(self.dim, 3, g=self.dim, name="pe")(v_map, train)
        return ConvBN(self.dim, 1, name="proj")(out, train)


class PSABlock(nn.Module):
    """Attention + conv-FFN with residuals. Block.cs:699-719."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 8
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = AttentionPSA(self.c, self.num_heads, self.attn_ratio,
                         name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = ConvBN(self.c * 2, 1, name="ffn.0")(x, train)
        f = ConvBN(self.c, 1, name="ffn.1")(f, train)
        return x + f if self.shortcut else f


class C2PSA(nn.Module):
    """CSP wrapper around stacked PSABlocks. Block.cs:664-697."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(x.shape[-1] * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        a, b = jnp.split(y, [c], axis=-1)
        for i in range(self.n):
            b = PSABlock(c, 0.5, c // 64, name=f"m.{i}")(b, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], -1), train)


class AAttn(nn.Module):
    """Area-attention: full attention within `area` sequence chunks.

    Block.cs:1029-1118. area=1 is global attention; area>1 partitions the
    flattened H*W sequence into `area` contiguous chunks (batched as extra
    leading dim — a free reshape, no data movement).
    """

    dim: int
    num_heads: int
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        nh = self.num_heads
        hd = self.dim // nh
        scale = hd ** -0.5

        qkv = ConvBN(hd * nh * 3, 1, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, 3 * c)
        if self.area > 1:
            qkv = qkv.reshape(b * self.area, n // self.area, 3 * c)
        bb, nn_, _ = qkv.shape
        qkv = qkv.reshape(bb, nn_, nh, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        from ..kernels import attention_bihd

        out = attention_bihd(q, k, v, scale)

        out = out.reshape(b, h, w, c)
        v_map = v.reshape(b, h, w, c)
        out = out + ConvBN(self.dim, 7, 1, 3, g=self.dim, use_bias=True,
                           name="pe")(v_map, train)
        return ConvBN(self.dim, 1, name="proj")(out, train)


class ABlock(nn.Module):
    """Area-attention block: AAttn + conv-MLP, both residual. Block.cs:991-1020."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, name="attn")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        m = ConvBN(hidden, 1, name="mlp.0")(x, train)
        m = ConvBN(self.dim, 1, name="mlp.1")(m, train)
        return x + m


class A2C2f(nn.Module):
    """Area-attention C2f (v12). Block.cs:891-983."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        assert c_ % 32 == 0, "A2C2f hidden dim must be a multiple of 32"
        y = [ConvBN(c_, 1, 1, name="cv1")(x, train)]
        for i in range(self.n):
            if self.a2:
                z = ABlock(c_, c_ // 32, self.mlp_ratio, self.area,
                           name=f"m.{i}.0")(y[-1], train)
                z = ABlock(c_, c_ // 32, self.mlp_ratio, self.area,
                           name=f"m.{i}.1")(z, train)
            else:
                z = C3k(c_, 2, self.shortcut, self.g, name=f"m.{i}")(y[-1], train)
            y.append(z)
        out = ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, -1), train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", nn.initializers.constant(0.01),
                               (self.c2,))
            return x + gamma.astype(out.dtype) * out
        return out


class TransformerLayer(nn.Module):
    """ViT-style layer without LayerNorm. Transformer.cs:53-91."""

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x):  # x: (B, N, C)
        c, nh = self.c, self.num_heads
        hd = c // nh

        def linear(name, use_bias=False):
            def apply(h):
                # (in, out) 2-D — transposed torch nn.Linear layout
                kern = self.param(f"{name}.weight", torch_linear_init,
                                  (h.shape[-1], c))
                y = h @ kern
                if use_bias:
                    y = y + self.param(f"{name}.bias",
                                       torch_bias_init(h.shape[-1]), (c,))
                return y
            return apply

        q = linear("q")(x)
        k = linear("k")(x)
        v = linear("v")(x)
        # torch MultiheadAttention: extra in/out projections
        in_w = self.param("ma.in_proj_weight", torch_linear_init,
                          (c, 3 * c))
        in_b = self.param("ma.in_proj_bias", nn.initializers.zeros, (3 * c,))
        q = q @ in_w[:, :c] + in_b[:c]
        k = k @ in_w[:, c:2 * c] + in_b[c:2 * c]
        v = v @ in_w[:, 2 * c:] + in_b[2 * c:]

        b, n, _ = q.shape
        q = q.reshape(b, n, nh, hd)
        k = k.reshape(b, n, nh, hd)
        v = v.reshape(b, n, nh, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bihd,bjhd->bhij", q * hd ** -0.5, k).astype(jnp.float32),
            axis=-1).astype(x.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, c)
        o = linear("ma.out_proj", use_bias=True)(o)
        x = o + x
        return linear("fc2")(linear("fc1")(x)) + x


class TransformerBlock(nn.Module):
    """Conv-in + learned position embedding + stacked layers. Transformer.cs:8-48."""

    c2: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = ConvBN(self.c2, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        pos_w = self.param("linear.weight", torch_linear_init, (c, c))
        pos_b = self.param("linear.bias", torch_bias_init(c), (c,))
        p = p + (p @ pos_w + pos_b)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, name=f"tr.{i}")(p)
        return p.reshape(b, h, w, self.c2)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner stack. Block.cs:499-520."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        a = TransformerBlock(c_, 4, self.n, name="m")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, name="cv3")(jnp.concatenate([a, b], -1), train)
