"""Pallas TPU kernel: one fused C2f block (n=1, shortcut) for inference.

The v8-family layer-2 C2f at 160² resolution is the single hottest spot of
a v8s-640 predict under XLA (~4.5 ms of 20: the channel-reducing 3x3s run
at 2-5%% MFU and every op round-trips HBM). This kernel computes the WHOLE
block — cv1 1x1 -> split -> Bottleneck(3x3, 3x3, residual) -> concat ->
cv2 1x1, all with folded-BN biases and SiLU — in one pallas_call: the
input is read from HBM once, every intermediate lives in VMEM, and all
six convs are MXU matmuls over an im2col flat layout.

Layout: the padded image is a 2-D array whose row index flattens (h, w)
with 2 pad columns on each side (Wp4 = W + 4) and 2 pad rows on top — so
a tile's R output rows need one aligned (R+4)-row window, streamed as two
R-row blocks. 3x3 taps are static slices of the zero-extended VMEM value
(positions that straddle image rows read masked-zero pad — exact XLA
zero-pad semantics; the pad ring is re-zeroed after each SiLU because
silu(folded_bias) != 0 there).

Reference: Block.cs:371-399 (C2f), Block.cs:572-608 (Bottleneck with the
e=1.0 argument-order quirk).

Measured outcome (v5e, b32, 160²x64): NOT viable — 34 ms vs XLA's ~4.5 ms.
Mosaic cannot lower a lane-dim concat of slices with differing sublane
offsets, so the im2col matrix must be assembled through scratch
column-block stores; those 9 unaligned-read/aligned-store passes per 3x3
conv dominate everything. Routing stays OFF (Config.pallas_conv=False);
the kernel is kept as a correct, tested record of the exploration — a
future Mosaic with strided-concat support would change the math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xa, xb, w1, b1, wm1, bm1, wm2, bm2, w2, b2, o_ref,
            scr0, scr1, scr2, pscr, *, R: int, W: int, H: int, Cin: int,
            c: int, C2: int):
    Wp4 = W + 4
    t = pl.program_id(1)
    n_rows = (R + 4) * Wp4
    # scratch border: >= Wp4+1 zeros, 8-aligned (sublane store alignment)
    pad = (Wp4 + 1 + 7) // 8 * 8
    off = pad - Wp4 - 1   # tap base shift inside the border

    # the (R+4)-row window (block A + the first 4 rows of block B) staged
    # through scratch at 8-aligned offsets (sublane-dim ref concat is not
    # lowerable)
    scr0[pl.ds(0, R * Wp4), :] = xa[0, :, :]
    scr0[pl.ds(R * Wp4, 4 * Wp4), :] = xb[0, pl.ds(0, 4 * Wp4), :]
    slab = scr0[pl.ds(0, n_rows), :]

    # validity mask of each flat position (real image vs pad ring)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    col = iota % Wp4
    row_im = t * R - 2 + iota // Wp4
    mask = ((col >= 2) & (col < W + 2) & (row_im >= 0)
            & (row_im < H)).astype(slab.dtype)

    def dot(p, w):
        return jax.lax.dot_general(p, w[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def silu(acc, b):
        acc = acc + b[:].astype(jnp.float32)[None, :]
        return acc * jax.nn.sigmoid(acc)

    def conv3x3(scr, pscr, v, w, b):
        """3x3/s1 conv of a masked flat value. The value is staged in a
        zero-bordered VMEM scratch so the 9 taps are plain ref slices
        (Mosaic cannot lower value-level pad+shift chains)."""
        @pl.when((pl.program_id(0) == 0) & (t == 0))
        def _():   # zero the borders once; they are never overwritten
            scr[pl.ds(0, pad), :] = jnp.zeros((pad, c), v.dtype)
            scr[pl.ds(pad + n_rows, pad), :] = jnp.zeros((pad, c), v.dtype)

        scr[pl.ds(pad, n_rows), :] = v
        # assemble the (N, 9c) im2col matrix in scratch: a lane-dim concat
        # of slices with differing sublane offsets is not lowerable, but
        # per-column-block stores are
        for i, (di, dj) in enumerate((di, dj) for di in range(3)
                                     for dj in range(3)):
            pscr[pl.ds(0, n_rows), i * c:(i + 1) * c] = \
                scr[pl.ds(off + di * Wp4 + dj, n_rows), :]
        return silu(dot(pscr[pl.ds(0, n_rows), :], w), b)

    y1 = silu(dot(slab, w1), b1).astype(slab.dtype)       # (N, 2c)
    a_half = y1[:, :c]
    b_half = y1[:, c:] * mask
    tt = conv3x3(scr1, pscr, b_half, wm1, bm1).astype(slab.dtype) * mask
    u = conv3x3(scr2, pscr, tt, wm2, bm2).astype(slab.dtype)
    z = b_half + u                                         # residual
    cat = jnp.concatenate([a_half, b_half, z], axis=1)     # (N, 3c)
    out = silu(dot(cat, w2), b2).astype(o_ref.dtype)       # (N, C2)

    # write the R center rows, stripping the 2+2 pad columns
    for r in range(R):
        base = (r + 2) * Wp4 + 2
        o_ref[0, r, :, :] = out[base:base + W, :]


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "interpret"))
def c2f_fused(x, w1, b1, wm1, bm1, wm2, bm2, w2, b2,
              rows_per_tile: int = 16, interpret: bool = False):
    """Fused C2f(n=1, shortcut=True) forward (inference, folded BN).

    x: (B, H, W, Cin). w1: (1, 1, Cin, 2c) or (Cin, 2c). wm1/wm2:
    (3, 3, c, c). w2: (1, 1, 3c, C2) or (3c, C2). Biases are the folded
    BN biases. Returns (B, H, W, C2)."""
    B, H, W, Cin = x.shape
    w1 = w1.reshape(Cin, -1)
    twoc = w1.shape[-1]
    c = twoc // 2
    wm1 = wm1.reshape(9 * c, c)
    wm2 = wm2.reshape(9 * c, c)
    w2 = w2.reshape(3 * c, -1)
    C2 = w2.shape[-1]
    R = rows_per_tile
    while H % R:
        R //= 2
    T = H // R
    Wp4 = W + 4
    dt = x.dtype

    # flat rows: 2 leading pad rows inside block 0; bottom pad fills the
    # (T+1)-block space so the last tile's B block is in-bounds zeros
    xp = jnp.pad(x, ((0, 0), (2, (T + 1) * R - H - 2), (2, 2), (0, 0)))
    x2 = xp.reshape(B, (T + 1) * R * Wp4, Cin)

    blk = (1, R * Wp4, Cin)
    full = lambda shape: pl.BlockSpec(shape, lambda b_, t: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, W=W, H=H, Cin=Cin, c=c, C2=C2),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(blk, lambda b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b_, t: (b_, t + 1, 0),
                         memory_space=pltpu.VMEM),
            full(w1.shape), full(b1.shape), full(wm1.shape),
            full(bm1.shape), full(wm2.shape), full(bm2.shape),
            full(w2.shape), full(b2.shape),
        ],
        out_specs=pl.BlockSpec((1, R, W, C2), lambda b_, t: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C2), dt),
        scratch_shapes=[
            pltpu.VMEM(((R + 4) * Wp4, Cin), dt),
            pltpu.VMEM(((R + 4) * Wp4 + 2 * ((Wp4 + 8) // 8 * 8), c), dt),
            pltpu.VMEM(((R + 4) * Wp4 + 2 * ((Wp4 + 8) // 8 * 8), c), dt),
            pltpu.VMEM(((R + 4) * Wp4, 9 * c), dt),
        ],
        interpret=interpret,
    )(x2, x2, w1.astype(dt), b1.astype(dt), wm1.astype(dt),
      bm1.astype(dt), wm2.astype(dt), bm2.astype(dt), w2.astype(dt),
      b2.astype(dt))
    return out


def c2f_eligible(n: int, shortcut: bool, g: int, H: int, W: int,
                 c: int, C2: int) -> bool:
    """Routing predicate: the fused block targets the layer-2 C2f shape
    class (n=1, shortcut, >=160² resolution, narrow channels)."""
    return (n == 1 and shortcut and g == 1 and H % 8 == 0 and W % 8 == 0
            and H * W >= 160 * 160 and 16 <= c <= 64 and C2 <= 128)
