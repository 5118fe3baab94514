"""Pallas TPU kernels: fused 3x3 conv (+bias +SiLU) for the small-channel
high-resolution layers XLA runs at 2-5% MFU.

Why: on v5e, XLA's layout choices for the early YOLO convs (Cout 32-64 at
160²-320² resolution) leave most of the 128 lanes idle; xprof attributes
3.3 ms of a 20 ms v8s-640 b32 predict to ONE such conv (C2f m.0.cv2 at
160², 64->32). The reference's counterpart is LibTorch's cuDNN pick
(YoloSharp/Modules/Convs.cs:44-62); this is the TPU-native answer.

How: the padded input image is viewed as a 2-D array whose row index
flattens (h, w) — so every conv tap (di, dj) of an R-row output tile is
ONE contiguous run of R*(W+2) rows. Each grid step streams two
non-overlapping row blocks (the tile's rows and the next tile's rows, for
the halo), builds the im2col patch matrix by concatenating the 9 tap
slabs along lanes, and runs a single MXU matmul with contraction 9*Ci
(fp32 accumulation) with bias+activation fused into the epilogue.
Positions that straddle an image row land in junk columns sliced off by
the caller. Stride-2 uses the same scheme over four parity planes
P[a][b][i,j] = xpad[2i+a, 2j+b], which turn the strided taps back into
aligned contiguous slabs.

VMEM per step is a few hundred KB (blocks are (R*(W+2), Ci) with lanes
padded to 128) — no whole-image residency, so 640² inputs are fine.

Measured (v5e, b32): standalone the kernel is 2.4x XLA on its target
class (64->32 @160²: 1.4 ms vs 3.5 ms; XLA at 1.5 TFLOP/s there), but
routed inside the full v8s-640 predict the pallas_call boundary (input
pad copy, junk-column slice, lost producer fusion) costs the win back
(1534 img/s routed vs 1566 unrouted), and the stride-2 parity-plane
variant is relayout-bound (5x slower than XLA). Routing is therefore OFF
by default (Config.pallas_conv); the kernels stay correct, tested, and
benchmarked as the starting point for other model/hardware mixes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(acc, b_ref, act, o_ref):
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    if act == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    elif act == "relu":
        acc = jnp.maximum(acc, 0.0)
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


def _tap(a_ref, b_ref, start: int, rows: int):
    """Rows [start, start+rows) of the tile's flattened row window, where
    a_ref holds rows [0, rows) and b_ref the next block [rows, 2*rows)."""
    if start == 0:
        return a_ref[0, :, :]
    return jnp.concatenate(
        [a_ref[0, pl.ds(start, rows - start), :],
         b_ref[0, pl.ds(0, start), :]], axis=0)


def _kernel_s1(xa_ref, xb_ref, w_ref, b_ref, o_ref, *, R: int, W: int,
               Ci: int, Co: int, act: str):
    Wp = W + 2
    rows = R * Wp
    taps = [_tap(xa_ref, xb_ref, di * Wp + dj, rows)
            for di in range(3) for dj in range(3)]
    p = jnp.concatenate(taps, axis=1)                        # (R*Wp, 9Ci)
    acc = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    if act == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    elif act == "relu":
        acc = jnp.maximum(acc, 0.0)
    # store rows unpadded: the output leaves the kernel already in
    # (H, W, Co) form — no junk-column slice (an extra HBM pass) outside
    y = acc.astype(o_ref.dtype)
    for r in range(R):
        o_ref[0, r, :, :] = y[r * Wp:r * Wp + W, :]


@functools.partial(jax.jit, static_argnames=("act", "rows_per_tile",
                                             "interpret"))
def conv3x3_silu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 act: str = "silu", rows_per_tile: int = 0,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused 3x3/s1/SAME conv + bias + activation. x: (B, H, W, Ci) NHWC,
    w: (3, 3, Ci, Co) HWIO, b: (Co,). Returns (B, H, W, Co)."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    # bigger tiles amortize per-grid-step overhead; cap R so the two
    # double-buffered input streams fit VMEM (blocks are (R*Wp, 128 lanes))
    def fits(r):
        return r * (W + 2) * 128 * 2 * 2 * 2 <= 8 * 2 ** 20
    R = rows_per_tile or next(r for r in (32, 16, 8)
                              if H % r == 0 and fits(r))
    assert H % R == 0, (H, R)
    Wp = W + 2
    T = H // R
    dt = x.dtype

    # flat rows: (T+1) blocks of R*Wp so the "next block" of the last tile
    # is in-bounds zero padding (covers the halo taps of the last rows)
    xp = jnp.pad(x, ((0, 0), (1, R - 1), (1, 1), (0, 0)))
    x2 = xp.reshape(B, (T + 1) * R * Wp, Ci)
    w2 = w.astype(dt).reshape(9 * Ci, Co)

    blk = (1, R * Wp, Ci)
    out = pl.pallas_call(
        functools.partial(_kernel_s1, R=R, W=W, Ci=Ci, Co=Co, act=act),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(blk, lambda b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b_, t: (b_, t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Ci, Co), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Co,), lambda b_, t: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W, Co),
                               lambda b_, t: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), dt),
        interpret=interpret,
    )(x2, x2, w2, b.astype(dt))
    return out


def _kernel_s2(xee_a, xee_b, xeo_a, xeo_b, xoe_a, xoe_b, xoo_a, xoo_b,
               w_ref, b_ref, o_ref, *, R: int, Wh: int, Ci: int, Co: int,
               act: str):
    """Stride-2 tile over four parity planes: tap (di, dj) of output
    (r, j) — x[2r+di-1, 2j+dj-1] = xpad[2r+di, 2j+dj] — lives in plane
    (di%2, dj%2) at (r + di//2, j + dj//2): aligned contiguous slabs."""
    rows = R * Wh
    planes = (((xee_a, xee_b), (xeo_a, xeo_b)),
              ((xoe_a, xoe_b), (xoo_a, xoo_b)))
    taps = []
    for di in range(3):
        for dj in range(3):
            a_ref, b_ref2 = planes[di % 2][dj % 2]
            taps.append(_tap(a_ref, b_ref2, (di // 2) * Wh + (dj // 2),
                             rows))
    p = jnp.concatenate(taps, axis=1)                        # (R*Wh, 9Ci)
    acc = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    _epilogue(acc, b_ref, act, o_ref)


@functools.partial(jax.jit, static_argnames=("act", "rows_per_tile",
                                             "interpret"))
def conv3x3s2_silu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   act: str = "silu", rows_per_tile: int = 0,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused 3x3/s2/SAME conv + bias + activation. x: (B, H, W, Ci) with
    even H, W; w: (3, 3, Ci, Co); b: (Co,). Returns (B, H/2, W/2, Co)."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    Ho, Wo = H // 2, W // 2
    Wh = Wo + 1
    R = rows_per_tile or next(r for r in (32, 16, 8) if Ho % r == 0)
    assert H % 2 == 0 and W % 2 == 0 and Ho % R == 0, (H, W, R)
    dt = x.dtype
    if Ci % 8:   # e.g. the 3-channel stem: zero-pad the contraction
        cpad = (-Ci) % 8
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad), (0, 0)))
        Ci += cpad

    T = Ho // R
    # parity planes of x padded by 1; each plane padded to (T+1) blocks of
    # R*Wh flat rows so the halo block of the last tile is in-bounds
    xp = jnp.pad(x, ((0, 0), (1, 2 * R + 1), (1, 3), (0, 0)))
    planes = [xp[:, a::2, b_::2, :][:, :(T + 1) * R, :Wh, :]
              .reshape(B, (T + 1) * R * Wh, Ci)
              for a in (0, 1) for b_ in (0, 1)]
    w2 = w.astype(dt).reshape(9 * Ci, Co)

    blk = (1, R * Wh, Ci)
    pspec_a = pl.BlockSpec(blk, lambda b_, t: (b_, t, 0),
                           memory_space=pltpu.VMEM)
    pspec_b = pl.BlockSpec(blk, lambda b_, t: (b_, t + 1, 0),
                           memory_space=pltpu.VMEM)
    in_specs = []
    args = []
    for pln in planes:
        in_specs += [pspec_a, pspec_b]
        args += [pln, pln]
    in_specs += [pl.BlockSpec((9 * Ci, Co), lambda b_, t: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((Co,), lambda b_, t: (0,),
                              memory_space=pltpu.VMEM)]
    out = pl.pallas_call(
        functools.partial(_kernel_s2, R=R, Wh=Wh, Ci=Ci, Co=Co, act=act),
        grid=(B, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R * Wh, Co), lambda b_, t: (b_, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho * Wh, Co), dt),
        interpret=interpret,
    )(*args, w2, b.astype(dt))
    return out.reshape(B, Ho, Wh, Co)[:, :, :Wo, :]


def eligible(k: int, s: int, d: int, g: int, H: int, W: int, Ci: int,
             Co: int) -> bool:
    """Static routing predicate for the fused-inference path.

    VMEM per grid step is ~2 blocks of (R*(W+2), 128 lanes) per input
    stream (1 for s=1, 4 planes for s=2) — small; the real constraints are
    shape divisibility and "is this a layer XLA handles badly" (high
    resolution, Ci*9 contraction >= 128, smallish Co)."""
    if not (k == 3 and d == 1 and g == 1 and Co >= 8 and Ci >= 3):
        return False
    # measured on v5e (b32): the kernel wins ~2.3x where XLA collapses
    # (channel-REDUCING convs at >=160² with Ci<=64, e.g. C2f cv2 64->32:
    # 1.5 ms vs 3.5 ms); XLA is already fine at Ci>=128 or Co>=Ci there
    # (6-10 TFLOP/s) and the kernel's grid overhead loses. Route only the
    # pathological class.
    if s == 1:
        return (H % 8 == 0 and W % 8 == 0 and H * W >= 160 * 160
                and Ci % 8 == 0 and Ci <= 64 and Co < Ci)
    # s=2 measured 5x SLOWER than XLA on v5e: the four parity-plane
    # strided slices are relayout-bound before the kernel even runs.
    # conv3x3s2_silu stays available (correct, tested) but is not routed.
    return False
