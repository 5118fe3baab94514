"""Pallas TPU kernel: fused 3x3 stride-1 conv + bias + SiLU for
small-output-channel, high-resolution layers.

Why: XLA's native conv on v5e runs the early YOLO convs (Cout 32-64 at
160²/80² resolution) at 2-5% MFU — channel-minor layouts leave most of
the 128 lanes idle and the conv decomposition never recovers (measured
via xprof: C2f m.0.cv2 at 160², 64->32 costs 3.3 ms of a 20 ms v8s-640
b32 predict; reference counterpart is LibTorch's cuDNN pick,
YoloSharp/Modules/Convs.cs:44-62).

How: one grid program computes an (R rows x W cols x Co) output tile.
The padded input image lives VMEM-resident per batch element as a 2-D
(rows x Ci) array whose row index flattens (h, w) — so every conv tap
(di, dj) is one *contiguous* (R*(W+2), Ci) slab. The 9 slabs concatenate
along lanes into an im2col patch matrix and a single MXU matmul with
contraction 9*Ci produces the tile; bias + SiLU fuse into the epilogue.
Junk columns from the horizontal padding are sliced off outside the
kernel (a cheap XLA slice). Accumulation in fp32.

Eligibility: k=3, s=1, H*W large, H % R == 0, fits VMEM. Used by
fused-inference predict (nn/common.py routes eligible ConvBN calls here);
training keeps XLA convs (autodiff + BN stats).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, R: int, W: int, Ci: int,
            Co: int, act: str):
    i = pl.program_id(1)
    Wp = W + 2
    base = i * R * Wp
    # tap (di, dj): output position (r, j) needs x[r+di, j+dj]. In the
    # flattened (h, w)->row space, that whole (R, W) window is ONE
    # contiguous run of R*Wp rows starting at base + di*Wp + dj (positions
    # that straddle a row boundary land in the 2 junk columns sliced off
    # by the caller).
    taps = []
    for di in range(3):
        for dj in range(3):
            taps.append(x_ref[0, pl.ds(base + di * Wp + dj, R * Wp), :])
    p = jnp.concatenate(taps, axis=1)                        # (R*Wp, 9Ci)
    acc = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    if act == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    elif act == "relu":
        acc = jnp.maximum(acc, 0.0)
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "rows_per_tile",
                                             "interpret"))
def conv3x3_silu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 act: str = "silu", rows_per_tile: int = 8,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused 3x3/s1/SAME conv + bias + activation. x: (B, H, W, Ci) NHWC,
    w: (3, 3, Ci, Co) HWIO, b: (Co,). Returns (B, H, W, Co)."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    R = rows_per_tile
    assert H % R == 0, (H, R)
    Wp = W + 2
    dt = x.dtype

    # bottom pad is 2: the last tile's (di=2, dj=2) tap slab runs 2
    # flattened rows past (H+2)*Wp
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
    x2 = xp.reshape(B, (H + 3) * Wp, Ci)
    w2 = w.astype(dt).reshape(9 * Ci, Co)

    out = pl.pallas_call(
        functools.partial(_kernel, R=R, W=W, Ci=Ci, Co=Co, act=act),
        grid=(B, H // R),
        in_specs=[
            # whole padded image resident in VMEM; refetched only when the
            # batch index changes (grid iterates tiles innermost)
            pl.BlockSpec((1, (H + 3) * Wp, Ci), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Ci, Co), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Co,), lambda b_, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R * Wp, Co), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * Wp, Co), dt),
        interpret=interpret,
    )(x2, w2, b.astype(dt))
    # drop the 2 junk columns per row introduced by horizontal padding
    return out.reshape(B, H, Wp, Co)[:, :, :W, :]


def _kernel_s2(xee_ref, xeo_ref, xoe_ref, xoo_ref, w_ref, b_ref, o_ref, *,
               R: int, Wh: int, Ci: int, Co: int, act: str):
    """Stride-2 tile: output (R, Wo) rows from four parity planes.

    Plane P[a][b][i, j] = xpad[2i+a, 2j+b] (xpad = x padded by 1), so the
    tap (di, dj) of output (r, j) — x[2r+di-1, 2j+dj-1] = xpad[2r+di,
    2j+dj] — is plane (di%2, dj%2) at (r + di//2, j + dj//2): an aligned,
    contiguous slab in the flattened (i, j)->row space.
    """
    t = pl.program_id(1)
    base = t * R * Wh
    planes = ((xee_ref, xeo_ref), (xoe_ref, xoo_ref))
    taps = []
    for di in range(3):
        for dj in range(3):
            ref = planes[di % 2][dj % 2]
            start = base + (di // 2) * Wh + (dj // 2)
            taps.append(ref[0, pl.ds(start, R * Wh), :])
    p = jnp.concatenate(taps, axis=1)                        # (R*Wh, 9Ci)
    acc = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    if act == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    elif act == "relu":
        acc = jnp.maximum(acc, 0.0)
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "rows_per_tile",
                                             "interpret"))
def conv3x3s2_silu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   act: str = "silu", rows_per_tile: int = 8,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused 3x3/s2/SAME conv + bias + activation. x: (B, H, W, Ci) with
    even H, W; w: (3, 3, Ci, Co); b: (Co,). Returns (B, H/2, W/2, Co)."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    Ho, Wo = H // 2, W // 2
    Wh = Wo + 1
    R = rows_per_tile
    assert H % 2 == 0 and W % 2 == 0 and Ho % R == 0, (H, W, R)
    dt = x.dtype

    # planes from x padded by 1 (top/left) and enough bottom/right for the
    # +1 plane-row/col taps of the last tile, plus one extra flattened row
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    planes = [xp[:, a::2, b_::2, :][:, :Ho + 2, :Wh, :]
              .reshape(B, (Ho + 2) * Wh, Ci)
              for a in (0, 1) for b_ in (0, 1)]
    w2 = w.astype(dt).reshape(9 * Ci, Co)

    pspec = pl.BlockSpec((1, (Ho + 2) * Wh, Ci), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_s2, R=R, Wh=Wh, Ci=Ci, Co=Co, act=act),
        grid=(B, Ho // R),
        in_specs=[pspec, pspec, pspec, pspec,
                  pl.BlockSpec((9 * Ci, Co), lambda b_, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Co,), lambda b_, i: (0,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R * Wh, Co), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho * Wh, Co), dt),
        interpret=interpret,
    )(*planes, w2, b.astype(dt))
    return out.reshape(B, Ho, Wh, Co)[:, :, :Wo, :]


def eligible(k: int, s: int, d: int, g: int, H: int, W: int, Ci: int,
             Co: int, vmem_budget: int = 6 * 2 ** 20) -> bool:
    """Static routing predicate for the fused-inference path."""
    if not (k == 3 and d == 1 and g == 1 and Ci % 8 == 0 and Co >= 8):
        return False
    if s == 1:
        return (H % 8 == 0 and W % 8 == 0 and H * W >= 80 * 80
                and (H + 3) * (W + 2) * Ci * 2 <= vmem_budget)
    if s == 2:
        # four parity planes resident in VMEM at once (conv1 at 320²x32
        # needs ~6.7MB; VMEM is 16MB/core and the planes are reused across
        # row tiles, so allow a larger budget than the s=1 single-image
        # case)
        return (H % 16 == 0 and W % 16 == 0 and H * W >= 160 * 160
                and Ci >= 16
                and 4 * (H // 2 + 2) * (W // 2 + 1) * Ci * 2
                <= max(vmem_budget, 7 * 2 ** 20))
    return False
