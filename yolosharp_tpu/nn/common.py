"""Conv/CSP building blocks as flax.linen modules (NHWC, TPU-native).

Functional parity targets: YoloSharp/Modules/Convs.cs (Conv/Conv2/DWConv/
LightConv/ConvTranspose/Focus/GhostConv/RepConv/CBAM/...) and
YoloSharp/Modules/Block.cs (Bottleneck/C1/C2/C2f/C3/C3k/C3k2/SPP/SPPF/
Proto/HG*/CIB/SCDown/RepVGGDW/...).

Design notes (TPU-first, not a translation):
 - NHWC layout end to end; convs hit the MXU directly via lax.conv.
 - BatchNorm eps=1e-3, torch-momentum 0.03 (flax momentum 0.97) to match
   the reference numerics (Convs.cs:41-42).
 - Submodules carry explicit names ("cv1", "m", "0", ...) so the parameter
   tree mirrors Ultralytics/YoloSharp state-dict names 1:1; the checkpoint
   mapper is then a pure rename (weight->kernel + OIHW->HWIO transpose).
 - Inference-time Conv+BN folding is a separate pure-params transform
   (ckpt/fuse.py), not module surgery like the reference's fuse().
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# initializers (match torch.nn.Conv2d / Linear defaults so training-from-
# scratch behaves like the reference)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on HWIO kernels == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear weight init on an (in, out) matrix."""
    bound = 1.0 / math.sqrt(shape[0]) if shape[0] > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


ACTS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


# ---------------------------------------------------------------------------
# fused-inference mode (the reference's fuse()/forward_fuse, Convs.cs:58-61)
#
# On TPU, eval-mode BatchNorm is not just extra FLOPs: its per-channel
# affine breaks XLA's conv layout chain at small channel counts, inserting
# full-tensor layout copies around every early conv (~40% of v8s-640
# forward time). With statistics pre-folded into the conv kernels
# (ckpt.fuse.fold_bn), BN collapses to a bias add that fuses into the conv,
# and the copies disappear.

import contextlib
import threading

_FUSED = threading.local()


def fused_inference_active() -> bool:
    return getattr(_FUSED, "on", False)


@contextlib.contextmanager
def fused_inference():
    """Trace-time switch: BN layers whose stats were folded by
    ckpt.fuse.fold_bn are replaced with a bias add. Wrap the *traced*
    call (e.g. the body of a jitted predict fn); params MUST be the
    output of fold_bn or results are wrong."""
    prev = fused_inference_active()
    _FUSED.on = True
    try:
        yield
    finally:
        _FUSED.on = prev


_HEADFUSE = threading.local()


def head_fuse_active() -> bool:
    return getattr(_HEADFUSE, "on", False)


@contextlib.contextmanager
def head_fuse(enable: bool = True):
    """Trace-time switch: the detection head's per-level cv2/cv3 FIRST
    convs (both 3x3 on the same feature map) run as ONE concatenated conv
    (c2+c3 output channels) and split — exact (kernel/bias concat along
    the output axis), fused-inference only. Measurement lever for the
    head-tower lane-occupancy question (ROUND_NOTES r4)."""
    prev = head_fuse_active()
    _HEADFUSE.on = bool(enable)
    try:
        yield
    finally:
        _HEADFUSE.on = prev


class _Conv2dParams(nn.Module):
    """Declares Conv2d's leaves (kernel + bias) without running it."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_kernel_init, self.shape)
        fan_in = self.shape[0] * self.shape[1] * self.shape[2]
        b = self.param("bias", torch_bias_init(fan_in), (self.shape[-1],))
        return k, b


class FoldedBN(nn.Module):
    """Stand-in for a BatchNorm folded into its conv: y = x + bias.

    Declares only the `bias` leaf (path-compatible with nn.BatchNorm's
    "bn.bias"); scale/mean/var leaves in the checkpoint are simply unread.
    """

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x + bias.astype(x.dtype)


class FastBN(nn.Module):
    """BatchNorm with half-precision normalize (TPU train-path fix).

    flax's nn.BatchNorm force-promotes the whole normalize chain
    ((x - mean) * mul + bias) to float32 when the stats are f32 —
    materializing full-size f32 copies between every train-mode conv and
    its activation. xprof attribution measured that chain at 25.7% +
    9.2% (data-formatting copies + lane pads) of the v12x-640 E2E OBB
    train step. This module computes the statistics exactly like flax
    (f32 reduces that XLA fuses with the convert, fast variance
    E[x^2] - E[x]^2, clipped at 0) but folds them into per-channel
    k = scale * rsqrt(var + eps) and b = bias - mean * k ((C,)-shaped
    f32 scalars) and applies x * k + b IN THE INPUT DTYPE — one fused
    fma, no f32 materialization. The param/batch_stats tree is identical
    to nn.BatchNorm's (scale/bias + mean/var, (C,) f32), so checkpoints
    and every fold/mapping path interchange. Gradients flow through
    mean/var exactly as in flax (reassociation-level fp differences
    only)."""

    momentum: float = 0.97
    epsilon: float = 1e-3
    axis: int = -1

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        ax = self.axis % x.ndim
        c = x.shape[ax]
        red = tuple(i for i in range(x.ndim) if i != ax)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, red)
            var = jnp.maximum(jnp.mean(xf * xf, red) - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        k = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * k
        shape = [1] * x.ndim
        shape[ax] = c
        return (x * k.reshape(shape).astype(x.dtype)
                + b.reshape(shape).astype(x.dtype))


_FLAXBN = threading.local()


@contextlib.contextmanager
def flax_bn():
    """Trace-time MEASUREMENT CONTROL: build the traced call with flax's
    nn.BatchNorm (f32-materializing normalize chain) instead of FastBN.
    Exists so paired perf harnesses can A/B the two in one process; never
    used on a production path."""
    prev = getattr(_FLAXBN, "on", False)
    _FLAXBN.on = True
    try:
        yield
    finally:
        _FLAXBN.on = prev


def batch_norm(y, train: bool, name: str = "bn"):
    """BN with reference numerics (eps 1e-3, torch momentum 0.03), or the
    folded bias add under fused_inference()."""
    if not train and fused_inference_active():
        return FoldedBN(name=name)(y)
    if getattr(_FLAXBN, "on", False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.97,
                            epsilon=1e-3, dtype=y.dtype, name=name)(y)
    return FastBN(name=name)(y, not train)


def packed_batch_norm(y, train: bool, order: str = "p", name: str = "bn"):
    """BatchNorm on an s2d-PACKED tensor with stats per ORIGINAL channel.

    The parity axis is exposed by a free trailing-dims reshape and joins
    the reduction axes, so the packed statistics equal the plain path's
    exactly (the packed tensor holds every original pixel once) and the
    scale/bias/running-stat leaves keep the plain (C,) shapes —
    checkpoints and the unpacked path stay interchangeable. order "p" =
    parity-major channels (p*C + c), "c" = c-major (c*4 + p)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    ax = -1 if order == "p" else -2
    yr = y.reshape((b, h, w, 4, c) if order == "p" else (b, h, w, c, 4))
    if getattr(_FLAXBN, "on", False):
        out = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                           epsilon=1e-3, dtype=y.dtype, name=name,
                           axis=ax)(yr)
    else:
        out = FastBN(name=name, axis=ax)(yr, not train)
    return out.reshape(b, h, w, c4)


# ---------------------------------------------------------------------------
# Pallas conv routing (TPU inference): the early small-channel 3x3 convs
# run at 2-5% MFU under XLA's layout choices; kernels/conv3x3.py is 3-7x
# faster there. Routed only under fused_inference() (predict) when active.

_PALLAS_CONV = threading.local()


def pallas_conv_active() -> bool:
    return getattr(_PALLAS_CONV, "on", False)


@contextlib.contextmanager
def pallas_conv(enable: bool = True):
    prev = pallas_conv_active()
    _PALLAS_CONV.on = enable
    try:
        yield
    finally:
        _PALLAS_CONV.on = prev


# ---------------------------------------------------------------------------
# Space-to-depth stride-2 conv rewrite (TPU inference): a stride-2 3x3 conv
# over few channels is *exactly* a stride-1 2x2 conv over the 2x2
# space-to-depth input (4x the channels, half the resolution) — the kernel
# repack is a pure weights transform. XLA's layout choice for tiny-channel
# stride-2 convs uses 32 of 128 lanes (measured: stem+conv1 hold ~3.6 ms of
# a 20 ms v8s-640 b32 forward); the rewritten conv is stride-1 with 4x the
# input channels, which tiles onto the MXU far better. Reference stem
# semantics: Convs.cs:44-62 (Conv k=3 s=2 p=1).

_S2D = threading.local()


def s2d_active() -> int:
    """Max input-channel count eligible for the rewrite (0 = off)."""
    return getattr(_S2D, "max_cin", 0)


def s2d_train_active() -> bool:
    """Whether the rewrite also applies to TRAIN-mode forwards."""
    return getattr(_S2D, "train_ok", False)


@contextlib.contextmanager
def s2d_stride2(max_cin: int = 3, allow_train: bool = False):
    """Trace-time switch: stride-2 3x3 ConvBNs with c1 <= max_cin are
    rewritten as space-to-depth + stride-1 2x2 conv (exact, params
    unchanged). Wrap the traced call like fused_inference().

    allow_train extends the rewrite to train-mode forwards (BN stats and
    gradients are exact: same conv output, kernel grad flows through the
    repack transposes)."""
    prev, prev_t = s2d_active(), s2d_train_active()
    _S2D.max_cin = max_cin
    _S2D.train_ok = allow_train
    try:
        yield
    finally:
        _S2D.max_cin = prev
        _S2D.train_ok = prev_t


def space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (py*2+px)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x):
    """Inverse of space_to_depth2: (B, H, W, 4C) -> (B, 2H, 2W, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def host_space_to_depth2(x):
    """numpy twin of space_to_depth2 — pack on the HOST so the stem's s2d
    rewrite pays no in-graph transpose (the transpose is what made the
    in-graph rewrite a measured loss on v5e; ROUND_NOTES round 3)."""
    import numpy as np
    b, h, w, c = x.shape
    x = np.asarray(x).reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(x.reshape(b, h // 2, w // 2, 4 * c))


_S2D_PACKED = threading.local()


def s2d_packed_active() -> bool:
    return getattr(_S2D_PACKED, "on", False)


def s2d_deep_active() -> bool:
    return getattr(_S2D_PACKED, "deep", False)


def s2d_packed_train_active() -> bool:
    """Whether the deep/deeper packed region also applies to TRAIN-mode
    forwards (real BatchNorm on the packed tensor via packed_batch_norm;
    stats and gradients exact — see s2d_packed_input(allow_train=True))."""
    return getattr(_S2D_PACKED, "train_ok", False)


def _s2d_pending() -> int:
    """Unpacked channel count of an s2d-packed tensor flowing between two
    consecutive ConvBN calls under deep packing (0 = none)."""
    return getattr(_S2D_PACKED, "pending", 0)


def _s2d_set_pending(c: int) -> None:
    _S2D_PACKED.pending = c


def _s2d_deeper_left() -> int:
    """Remaining post-stem ConvBNs that should EMIT packed (deeper mode):
    1 at region entry (conv1), decremented on use; 0 = next pending
    consumer unpacks."""
    return getattr(_S2D_PACKED, "deeper_left", 0)


def _s2d_dec_deeper() -> None:
    _S2D_PACKED.deeper_left = _s2d_deeper_left() - 1


def _s2d_final_plain() -> bool:
    """True when the LAST packed CSP block must emit a plain tensor via
    one depth-to-space (its output is an FPN skip source — layer 4 in
    all four arch tables — so a packed emit would leak to the neck
    concat). Auto-set for region depth >= 2; at depth 1 the final block
    (layer 2, never saved) emits packed for the FLOP-neutral conv
    consume."""
    return getattr(_S2D_PACKED, "final_plain", False)


@contextlib.contextmanager
def s2d_packed_input(enable: bool = True, deep: bool = False,
                     deeper: int = 0, allow_train: bool = False):
    """Trace-time switch: the network input is ALREADY 2x2 space-to-depth
    packed on the host (host_space_to_depth2). The stem — the first
    stride-2 3x3 ConvBN, recognized by its packed 12-channel input — runs
    as the exact stride-1 2x2 repacked conv directly on the packed input
    (no in-graph transpose). Exact; params unchanged.

    deep=True additionally keeps the stem's OUTPUT in space-to-depth form
    (the stem runs as a stride-2 conv over the packed input that emits
    s2d(y) directly — 4x the channels at half the resolution, a pure
    weights transform) and the NEXT stride-2 3x3 ConvBN (conv1 in all four
    archs, Yolo.cs:41-89/137-198) consumes that packed tensor as the exact
    2x2 stride-1 repacked conv, emitting a plain tensor. Both early convs
    then run with >=4x the channels (full MXU lanes) and there is still no
    in-graph space-to-depth transpose anywhere. If the layer after the
    stem is not an eligible 3x3/s2 ConvBN the trace fails loudly.

    deeper (an int depth; True = 1; implies deep) extends the packed
    region `deeper` ConvBN+CSP-block pairs further: each of the next
    `deeper` stride-2 ConvBNs (conv1, then conv2, ...) ALSO emits packed
    (repack_s2d_kernel_p2p stride-2, FLOP-neutral) and the CSP block
    after it (C2f / C3k2(c3k=False) / C3) runs ENTIRELY on the packed
    grid — its 1x1 convs as parity-block-diagonal 1x1s and its 3x3/s1
    bottleneck convs as 3-tap stride-1 packed convs (4x dense FLOPs for
    4x MXU lane occupancy; the small-channel high-res convs this targets
    were measured at ~4.5% MFU, docs/ROUND_NOTES.md) — then the next
    stride-2 ConvBN consumes the packed tensor with the FLOP-neutral
    unpack repack. Anything ineligible fails the trace loudly.

    allow_train extends the deep/deeper region to TRAIN-mode forwards:
    the packed convs run with REAL BatchNorm whose reduction includes the
    exposed parity axis (packed_batch_norm), so stats, gradients and the
    param tree are exactly the plain path's. Requires the packed canvas
    input (the device-augment render emits it for free —
    data/device_augment.py packed=True)."""
    prev, prev_deep = s2d_packed_active(), s2d_deep_active()
    prev_pending = _s2d_pending()
    prev_deeper = _s2d_deeper_left()
    prev_final = _s2d_final_plain()
    prev_train = s2d_packed_train_active()
    _S2D_PACKED.on = enable
    _S2D_PACKED.deep = enable and (deep or bool(deeper))
    _S2D_PACKED.pending = 0
    _S2D_PACKED.deeper_left = int(deeper) if enable else 0
    _S2D_PACKED.final_plain = enable and int(deeper) >= 2
    _S2D_PACKED.train_ok = enable and allow_train
    try:
        yield
    finally:
        _S2D_PACKED.on = prev
        _S2D_PACKED.deep = prev_deep
        _S2D_PACKED.pending = prev_pending
        _S2D_PACKED.deeper_left = prev_deeper
        _S2D_PACKED.final_plain = prev_final
        _S2D_PACKED.train_ok = prev_train


def repack_s2d_kernel(kernel):
    """(3, 3, C, O) stride-2 kernel -> equivalent (2, 2, 4C, O) stride-1
    kernel over the space-to-depth2 input.

    Derivation: output (y, x) of the stride-2 conv reads input rows
    2y-1..2y+1 = rows {2(y-1+KY)+py : (KY,py) != (0,0)} of the s2d grid
    window [y-1, y]; i.e. tap (KY, py) maps to original dy = 2*KY+py-2,
    with (KY,py)=(0,0) falling outside the 3x3 support (zero). Padding one
    zero row/col at the top-left makes the map a pure reshape/transpose.
    """
    c, o = kernel.shape[2], kernel.shape[3]
    w3p = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = w3p.reshape(2, 2, 2, 2, c, o)          # (KY, py, KX, px, C, O)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5)         # (KY, KX, py, px, C, O)
    return w2.reshape(2, 2, 4 * c, o)


def repack_s2d_kernel6(kernel):
    """(6, 6, C, O) stride-2 pad-2 kernel (the v5u stem, Yolo.cs:137-198
    ConvBN(c, 6, 2, 2)) -> equivalent (3, 3, 4C, O) stride-1 pad-1 kernel
    over the space_to_depth2 input.

    Derivation: output (y, x) reads original rows 2y-2..2y+3; s2d grid row
    g covers original rows {2g, 2g+1}, so the window is s2d rows y-1..y+1
    and tap (KY, py) maps to dy = 2*KY + py - 2 — all 36 taps map 1:1
    (no zero taps; the 6x6/s2 fold is exact as a pure reshape/transpose).
    """
    c, o = kernel.shape[2], kernel.shape[3]
    w2 = kernel.reshape(3, 2, 3, 2, c, o)       # (KY, py, KX, px, C, O)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5)         # (KY, KX, py, px, C, O)
    return w2.reshape(3, 3, 4 * c, o)


def _s2d_deep_sel(k: int, p: int, stride: int = 2):
    """Per-dimension selection tensor for the s2d-in -> s2d-OUT repack.

    For an original stride-`stride` kernel of size `k`, pad `p`, acting on
    x with both input u = s2d(x) and output z = s2d(y) on the half-res
    grid:
      z[n, q] = y[2n+q] = sum_j w[j] x[stride*(2n+q) + j - p]
    and x[2g + pi] = u[g, pi] gives the tap equation
      j = 2s + pi + p - stride*q
    for u-grid offset g = stride*n + s. Returns (sel[s, pi, q, j] in
    {0,1}, pad_lo, pad_hi, taps) such that the equivalent conv over u has
    the SAME stride, `taps` taps per dim and asymmetric padding
    (pad_lo, pad_hi). stride=2 is the deep stem repack; stride=1 covers
    1x1 (k=1, p=0: the parity-diagonal) and 3x3/s1 packed convs.
    """
    import numpy as np
    combos = [(s, pi, q, 2 * s + pi + p - stride * q)
              for s in range(-3, 4) for pi in range(2) for q in range(2)
              if 0 <= 2 * s + pi + p - stride * q < k]
    s_vals = sorted({s for s, *_ in combos})
    assert s_vals == list(range(s_vals[0], s_vals[-1] + 1))
    sel = np.zeros((len(s_vals), 2, 2, k), np.float32)
    for s, pi, q, j in combos:
        sel[s - s_vals[0], pi, q, j] = 1.0
    return (sel, -s_vals[0], max(0, s_vals[-1] - (stride - 1)),
            len(s_vals))


def repack_s2d_kernel_deep(kernel, p: Optional[int] = None):
    """(K, K, C, O) stride-2 pad-P kernel -> equivalent stride-2 kernel
    over the space_to_depth2 INPUT that emits the space_to_depth2 OUTPUT
    (4C in-channels, 4O out-channels, half-res in both grids). Returns
    (kernel', ((pad_lo, pad_hi),)*2). Exact: both the input and the output
    stay packed, so chaining this stem with a consuming repack_s2d_kernel
    conv removes every in-graph space-to-depth transpose. K=3/P=1 gives a
    3x3 kernel (taps s in {-1,0,1}); K=6/P=2 (the v5u stem) gives 4x4."""
    k = kernel.shape[0]
    p = k // 2 if p is None else p
    c, o = kernel.shape[2], kernel.shape[3]
    sel, pad_lo, pad_hi, _ = _s2d_deep_sel(k, p)
    seln = jnp.asarray(sel, kernel.dtype)
    # W'[sy,sx, (py px c), (qy qx o)] = sum_{jy,jx} sel[sy,py,qy,jy]
    #                                  * sel[sx,px,qx,jx] * w[jy,jx,c,o]
    w = jnp.einsum("aeiy,bfjx,yxco->abefijco", seln, seln, kernel,
                   precision=jax.lax.Precision.HIGHEST)
    w = w.transpose(0, 1, 2, 3, 6, 4, 5, 7)     # (sy,sx,py,px,c,qy,qx,o)
    t = w.shape[0]
    return (w.reshape(t, t, 4 * c, 4 * o),
            ((pad_lo, pad_hi), (pad_lo, pad_hi)))


def _pconv_bn(x, w, b, *, stride: int = 1, in_order: str = "p",
              out_order: str = "p", act: str = "silu"):
    """Folded ConvBN on an s2d-PACKED tensor: the original (K,K,C,O)
    stride-`stride` conv runs as its packed->packed equivalent
    (repack_s2d_kernel_p2p) with the folded-BN bias replicated over the
    4 parity blocks in the requested output ordering."""
    keff, pad = repack_s2d_kernel_p2p(w, stride=stride, in_order=in_order,
                                      out_order=out_order)
    y = jax.lax.conv_general_dilated(
        x, keff.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rep = jnp.repeat(b, 4) if out_order == "c" else jnp.tile(b, 4)
    return ACTS[act](y + rep.astype(x.dtype))


def repack_s2d_kernel_p2p(kernel, stride: int = 1, p: Optional[int] = None,
                          in_order: str = "p", out_order: str = "p"):
    """General s2d-packed-in -> s2d-packed-OUT kernel repack.

    (K, K, C, O) stride-`stride` pad-`p` kernel on the ORIGINAL grid ->
    the equivalent stride-`stride` kernel over the packed grid with 4C
    in / 4O out channels. Returns (kernel', padding). Exact; the packed
    conv runs `taps^2/(K^2/stride^2)`-times denser FLOPs in exchange for
    4x the MXU lane occupancy (FLOP-neutral at stride 2; 4x dense at
    stride 1 — a measured trade for the <=64-channel @>=160^2 convs XLA
    runs at ~4.5% MFU).

    Channel orderings: "p" = parity-major (py, px, c) — the
    host_space_to_depth2 / repack_s2d_kernel convention; "c" = c-major
    (c, py, px) — makes channel split/concat of packed tensors a
    contiguous slice (what the packed C2f needs internally). Orderings
    are baked into the kernel; mixing is free.
    """
    k = kernel.shape[0]
    p = k // 2 if p is None else p
    c, o = kernel.shape[2], kernel.shape[3]
    sel, pad_lo, pad_hi, _ = _s2d_deep_sel(k, p, stride)
    seln = jnp.asarray(sel, kernel.dtype)
    w = jnp.einsum("aeiy,bfjx,yxco->abefijco", seln, seln, kernel,
                   precision=jax.lax.Precision.HIGHEST)
    # dims: (sy, sx, py, px, qy, qx, c, o)
    if in_order == "p":
        w = w.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # (sy,sx,py,px,c,qy,qx,o)
    else:
        w = w.transpose(0, 1, 6, 2, 3, 4, 5, 7)  # (sy,sx,c,py,px,qy,qx,o)
    if out_order == "c":
        w = w.transpose(0, 1, 2, 3, 4, 7, 5, 6)  # (..., o, qy, qx)
    t = w.shape[0]
    return (w.reshape(t, t, 4 * c, 4 * o),
            ((pad_lo, pad_hi), (pad_lo, pad_hi)))


# ---------------------------------------------------------------------------
# int8 post-training quantization (TPU inference): v5e's int8 MXU peak is
# ~2x bf16. ConvBN convs run as symmetric int8 x int8 -> int32 with
# per-output-channel weight scales and a per-tensor activation scale from
# calibration; dequant + folded-BN bias + activation stay in the conv
# epilogue (XLA fuses). Calibration absmax stats live in a flax variable
# collection "quant_stats" keyed by module path, collected by running
# eval forwards under quant_calibrate() with that collection mutable.
# Head final convs are plain Conv2d (never quantized); DFL/decode stay fp.

_QUANT = threading.local()


def quant_calibrating() -> bool:
    return getattr(_QUANT, "calibrating", False)


def quant_int8_active() -> bool:
    return getattr(_QUANT, "int8", False)


@contextlib.contextmanager
def quant_calibrate():
    """Trace-time switch: eligible ConvBNs sow absmax(input) into the
    mutable "quant_stats" collection (reduce = running max)."""
    prev = quant_calibrating()
    _QUANT.calibrating = True
    try:
        yield
    finally:
        _QUANT.calibrating = prev


@contextlib.contextmanager
def quant_int8(enable: bool = True):
    """Trace-time switch: eligible ConvBNs with calibration stats present
    run as int8 (symmetric, per-channel weights / per-tensor activations,
    int32 accumulation). Wrap the traced predict call."""
    prev = quant_int8_active()
    _QUANT.int8 = enable
    try:
        yield
    finally:
        _QUANT.int8 = prev


def int8_conv(x, kernel, strides, padding, absmax):
    """Symmetric int8 quantized conv with int32 MXU accumulation.

    x: activations (any float dtype), kernel: (kh, kw, cin, cout) float,
    absmax: scalar calibrated max|x|. Returns float32 (dequantized).
    """
    a_scale = (jnp.maximum(absmax, 1e-6) / 127.0).astype(jnp.float32)
    w_absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    w_scale = (jnp.maximum(w_absmax, 1e-12) / 127.0).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                  -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(kernel.astype(jnp.float32) / w_scale),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (a_scale * w_scale)


class Conv2d(nn.Module):
    """Bare torch-style conv (NHWC). Named leaf params: kernel[, bias]."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = autopad(self.k, self.p, self.d)
        c1 = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (self.k, self.k, c1 // self.g, self.c2))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.s, self.s),
            padding=((p, p), (p, p)),
            rhs_dilation=(self.d, self.d),
            feature_group_count=self.g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = self.k * self.k * (c1 // self.g)
            bias = self.param("bias", torch_bias_init(fan_in), (self.c2,))
            y = y + bias.astype(y.dtype)
        return y


class _KernelParam(nn.Module):
    """Declares (and returns) just the conv kernel leaf — used when the
    Pallas path consumes the kernel directly but the param tree must stay
    identical to Conv2d's ("conv.kernel")."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kernel_init, self.shape)


class _BiasParam(nn.Module):
    """Declares just the folded-BN bias leaf ("bn.bias")."""

    c: int

    @nn.compact
    def __call__(self):
        return self.param("bias", nn.initializers.zeros, (self.c,))


class ConvBN(nn.Module):
    """Conv + BatchNorm + activation (the reference's Convs.Conv)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    use_bias: bool = False
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # deep-packing handshake (s2d_packed_input(deep=True)): the
        # previous layer (the stem) emitted its output space-to-depth
        # packed; this conv consumes it as the exact 2x2 stride-1 repacked
        # conv and emits a plain tensor. Only the first post-stem layer can
        # see a pending flag; anything ineligible fails the trace loudly
        # rather than silently mis-compute. Train-mode forwards take the
        # same branch under allow_train (real BN; stats/grads exact).
        if _s2d_pending() and ((not train and fused_inference_active())
                               or (train and s2d_packed_train_active())):
            c1 = _s2d_pending()
            _s2d_set_pending(0)
            if not (self.k == 3 and self.s == 2 and self.d == 1
                    and self.g == 1 and not self.use_bias
                    and autopad(self.k, self.p, self.d) == 1
                    and len(x.shape) == 4 and x.shape[-1] == 4 * c1):
                raise ValueError(
                    "s2d deep packing: the layer after the stem is not an "
                    "eligible 3x3/s2 ConvBN — disable deep packing for "
                    f"this architecture (got k={self.k} s={self.s} "
                    f"cin={x.shape[-1]} expecting {4 * c1})")
            kernel = _KernelParam((3, 3, c1, self.c2), name="conv")()
            if _s2d_deeper_left() > 0:
                # deeper region: this conv (conv1) ALSO emits packed —
                # stride-2 packed->packed (FLOP-neutral) — and flags the
                # following block (a C2f) to run on the packed grid.
                _s2d_dec_deeper()
                keff, pad = repack_s2d_kernel_p2p(kernel, stride=2, p=1)
                y = jax.lax.conv_general_dilated(
                    x, keff.astype(x.dtype), (2, 2), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if train:
                    y = packed_batch_norm(y, train, "p")
                else:
                    bias = _BiasParam(self.c2, name="bn")()
                    y = y + jnp.tile(bias, 4).astype(y.dtype)
                _s2d_set_pending(self.c2)
                return ACTS[self.act](y)
            y = jax.lax.conv_general_dilated(
                x, repack_s2d_kernel(kernel).astype(x.dtype), (1, 1),
                ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = batch_norm(y, train)
            return ACTS[self.act](y)
        # Pallas fast path (TPU fused inference, fold_bn'd params): conv +
        # folded-BN bias + activation in one kernel epilogue — avoids both
        # XLA's pathological small-channel conv and an extra elementwise
        # pass over the output.
        if (not train and fused_inference_active() and pallas_conv_active()
                and not self.use_bias and len(x.shape) == 4
                and autopad(self.k, self.p, self.d) == self.k // 2):
            from ..kernels.conv3x3 import conv3x3_silu, eligible

            if eligible(self.k, self.s, self.d, self.g, x.shape[1],
                        x.shape[2], x.shape[-1], self.c2):
                kernel = _KernelParam(
                    (self.k, self.k, x.shape[-1], self.c2),
                    name="conv")()
                bias = _BiasParam(self.c2, name="bn")()
                return conv3x3_silu(x, kernel.astype(x.dtype),
                                    bias.astype(x.dtype), act=self.act)
        # space-to-depth rewrite of small-channel stride-2 3x3 convs (exact;
        # see s2d_stride2 above). Param tree untouched: the (3,3,C,c2)
        # kernel leaf is repacked to (2,2,4C,c2) inside the traced graph.
        use_s2d = (((not train and fused_inference_active())
                    or (train and s2d_train_active()))
                   and 0 < x.shape[-1] <= s2d_active()
                   and self.k == 3 and self.s == 2 and self.d == 1
                   and self.g == 1 and not self.use_bias
                   and autopad(self.k, self.p, self.d) == 1
                   and len(x.shape) == 4
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        # host-packed variant (s2d_packed_input): the input arrives already
        # space-to-depth packed as 12 = 4*3 channels; only the stem can see
        # that channel count (every later stride-2 conv in the zoo has
        # cin >= 16), so this recognizes exactly the stem conv. Covers the
        # 3x3/s2/p1 stem (v8/v11/v12) and the 6x6/s2/p2 stem (v5u).
        # TRAIN-mode packing (the device-augment render can emit the packed
        # canvas at zero cost — data/device_augment.py packed=True) runs
        # the same repacked conv with real BN; stats/grads are exact (the
        # conv output is the plain stem output, the kernel grad flows
        # through the repack transposes).
        use_packed = ((train or fused_inference_active())
                      and s2d_packed_active() and x.shape[-1] == 12
                      and self.s == 2 and self.d == 1
                      and self.g == 1 and not self.use_bias
                      and len(x.shape) == 4
                      and ((self.k == 3
                            and autopad(self.k, self.p, self.d) == 1)
                           or (self.k == 6
                               and autopad(self.k, self.p, self.d) == 2)))
        if use_packed:
            kernel = _KernelParam((self.k, self.k, 3, self.c2),
                                  name="conv")()
            if s2d_deep_active() and (not train
                                      or s2d_packed_train_active()):
                # emit the stem output space-to-depth packed too (stride-2
                # conv over the packed input; pure weights transform) and
                # flag the next ConvBN to consume it. Folded-BN bias is
                # per original channel, tiled over the 4 parity blocks;
                # train mode runs real BN over the exposed parity axis.
                keff, pad = repack_s2d_kernel_deep(
                    kernel, autopad(self.k, self.p, self.d))
                y = jax.lax.conv_general_dilated(
                    x, keff.astype(x.dtype), (2, 2), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if train:
                    y = packed_batch_norm(y, train, "p")
                else:
                    bias = _BiasParam(self.c2, name="bn")()
                    y = y + jnp.tile(bias, 4).astype(y.dtype)
                _s2d_set_pending(self.c2)
                return ACTS[self.act](y)
            if self.k == 3:
                keff, pad = repack_s2d_kernel(kernel), ((1, 0), (1, 0))
            else:
                keff, pad = repack_s2d_kernel6(kernel), ((1, 1), (1, 1))
            y = jax.lax.conv_general_dilated(
                x, keff.astype(x.dtype), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = batch_norm(y, train)
            return ACTS[self.act](y)
        # int8 PTQ eligibility (see quant_int8 above): dense non-dilated
        # ConvBN convs during fused-inference predict. Calibration sows the
        # conv-input absmax; predict requires the sown stat to be present.
        quant_ok = (not train and not self.use_bias and self.g == 1
                    and self.d == 1 and len(x.shape) == 4
                    and fused_inference_active())
        if quant_ok and quant_calibrating():
            self.sow("quant_stats", "absmax",
                     jnp.max(jnp.abs(x)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
        use_int8 = (quant_ok and quant_int8_active()
                    and self.has_variable("quant_stats", "absmax"))
        if use_s2d or use_int8:
            kernel = _KernelParam((self.k, self.k, x.shape[-1], self.c2),
                                  name="conv")()
            if use_s2d:
                xin = space_to_depth2(x)
                keff = repack_s2d_kernel(kernel)
                strides, padding = (1, 1), ((1, 0), (1, 0))
            else:
                p = autopad(self.k, self.p, self.d)
                xin, keff = x, kernel
                strides, padding = (self.s, self.s), ((p, p), (p, p))
            if use_int8:
                absmax = self.get_variable("quant_stats", "absmax")
                y = int8_conv(xin, keff, strides, padding,
                              absmax).astype(x.dtype)
            else:
                y = jax.lax.conv_general_dilated(
                    xin, keff.astype(x.dtype), strides, padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = batch_norm(y, train)
            return ACTS[self.act](y)
        y = Conv2d(self.c2, self.k, self.s, self.p, self.g, self.d,
                   use_bias=self.use_bias, name="conv")(x)
        y = batch_norm(y, train)
        return ACTS[self.act](y)


class Conv2(nn.Module):
    """Simplified RepConv: parallel 3x3 + 1x1 convs sharing one BN.

    Convs.cs:67-103. The reference fuses lazily on first eval forward; here
    both branches always run (XLA fuses them), and deploy-time folding is a
    params transform (ckpt/fuse.py).
    """

    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, self.k, self.s, self.p, self.g, self.d,
                   use_bias=False, name="conv")(x)
        y = y + Conv2d(self.c2, 1, self.s, 0, self.g, self.d,
                       use_bias=False, name="cv2")(x)
        y = batch_norm(y, train)
        return ACTS[self.act](y)


class DWConv(ConvBN):
    """Depthwise conv: groups = gcd(c1, c2); c1 resolved at call time."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        y = Conv2d(self.c2, self.k, self.s, self.p, g, self.d,
                   use_bias=self.use_bias, name="conv")(x)
        y = batch_norm(y, train)
        return ACTS[self.act](y)


class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise k conv (ReLU). Convs.cs:119-134."""

    c2: int
    k: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, act="identity", name="conv1")(x, train)
        return DWConv(self.c2, self.k, act=self.act, name="conv2")(y, train)


class ConvTranspose2dRaw(nn.Module):
    """Bare torch-semantics ConvTranspose2d as a dilated conv.

    Exact equivalence: convT(x, W, s, p) == conv(dilate_s(x), flip(W),
    pad=k-1-p). Kernel stored HWIO (kh, kw, cin, cout).
    """

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c1 = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (self.k, self.k, c1, self.c2))
        pad = self.k - 1 - self.p
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1)).astype(x.dtype),
            window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.s, self.s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(c1 * self.k * self.k),
                              (self.c2,))
            y = y + bias.astype(y.dtype)
        return y


class DWConvTranspose2d(nn.Module):
    """Depthwise transpose conv (groups = gcd(c1, c2)). Convs.cs:139-152.

    Grouped transpose conv expressed as per-group dilated convs; for the
    depthwise case (g == c1 == c2) this is a single feature-grouped conv.
    """

    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        g = math.gcd(c1, self.c2)
        kernel = self.param("kernel", torch_kernel_init,
                            (self.k, self.k, c1 // g, self.c2))
        pad = self.k - 1 - self.p1
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1)).astype(x.dtype),
            window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.s, self.s), feature_group_count=g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias = self.param("bias", torch_bias_init(
            self.k * self.k * (c1 // g)), (self.c2,))
        return y + bias.astype(y.dtype)


class Index(nn.Module):
    """Select one tensor from a list (Convs.cs:453-466)."""

    index: int = 0

    def __call__(self, xs, train: bool = False):
        return xs[self.index]


class ConvTranspose(nn.Module):
    """ConvTranspose2d + optional BN + act. Convs.cs:157-182."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvTranspose2dRaw(self.c2, self.k, self.s, self.p,
                               use_bias=not self.bn, name="conv_transpose")(x)
        if self.bn:
            y = batch_norm(y, train)
        return ACTS[self.act](y)


class Focus(nn.Module):
    """Space-to-channel stem (2x2 pixel de-interleave) + Conv. Convs.cs:187-206."""

    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        patches = jnp.concatenate([
            x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2],
        ], axis=-1)
        return ConvBN(self.c2, self.k, self.s, name="conv")(patches, train)


class GhostConv(nn.Module):
    """Ghost convolution (half primary, half cheap depthwise). Convs.cs:211-228."""

    c2: int
    k: int = 1
    s: int = 1
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, act=self.act, name="cv1")(x, train)
        y2 = ConvBN(c_, 5, 1, g=c_, act=self.act, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class RepConv(nn.Module):
    """Training-mode RepVGG conv: 3x3 + 1x1 (+ optional identity BN).

    Convs.cs:233-359. Deploy-time branch fusion is a params transform in
    ckpt/fuse.py (fuse_repconv), not a module mode switch.
    """

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    use_bn: bool = False
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 3, self.s, 1, self.g, act="identity",
                   name="conv1")(x, train)
        y = y + ConvBN(self.c2, 1, self.s, 0, self.g, act="identity",
                       name="conv2")(x, train)
        if self.use_bn and x.shape[-1] == self.c2 and self.s == 1:
            y = y + FastBN(name="bn")(x, not train)
        return ACTS[self.act](y)


class ChannelAttention(nn.Module):
    """Squeeze-excite channel gate. Convs.cs:365-382."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = x.mean(axis=(1, 2), keepdims=True)
        gate = Conv2d(x.shape[-1], 1, use_bias=True, name="fc")(pooled)
        return x * jax.nn.sigmoid(gate)


class SpatialAttention(nn.Module):
    """Mean/max-channel spatial gate. Convs.cs:387-410."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        stats = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        gate = Conv2d(1, self.kernel_size, use_bias=False, name="cv1")(stats)
        return x * jax.nn.sigmoid(gate)


class CBAM(nn.Module):
    """Convolutional Block Attention Module. Convs.cs:415-430."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(name="channel_attention")(x, train)
        return SpatialAttention(self.kernel_size, name="spatial_attention")(x, train)


class Bottleneck(nn.Module):
    """Standard bottleneck. Block.cs:572-608."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class GhostBottleneck(nn.Module):
    """Ghost bottleneck. Block.cs:540-567."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, name="conv.0")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act="identity", name="conv.1")(y, train)
        y = GhostConv(self.c2, 1, 1, act="identity", name="conv.2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act="identity",
                        name="shortcut.0")(x, train)
            sc = ConvBN(self.c2, 1, 1, act="identity", name="shortcut.1")(sc, train)
        else:
            sc = x
        return y + sc


def max_pool_same(x, k: int, s: int = 1):
    """MaxPool with torch 'pad k//2' semantics (pads with -inf)."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


class SPP(nn.Module):
    """Spatial pyramid pooling. Block.cs:195-231."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, name="cv1")(x, train)
        pools = [y] + [max_pool_same(y, kk) for kk in self.k]
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(pools, -1), train)


class SPPF(nn.Module):
    """SPP-Fast: chained maxpools. Block.cs:236-285.

    NOTE the reference's cv1 has Identity activation (Block.cs:257) — an
    intentional deviation from Ultralytics kept for output parity.
    """

    c2: int
    k: int = 5
    n: int = 3
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = [ConvBN(c_, 1, 1, act="identity", name="cv1")(x, train)]
        for _ in range(self.n):
            y.append(max_pool_same(y[-1], self.k))
        out = ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(y, -1), train)
        return out + x if self.shortcut and x.shape[-1] == self.c2 else out


class C1(nn.Module):
    """CSP bottleneck, 1 conv. Block.cs:290-320.

    NOTE: the reference builds exactly one inner conv regardless of n
    (Block.cs:306 iterates Range(0, 1)); mirrored for parity.
    """

    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        z = ConvBN(self.c2, 3, name="m.0")(y, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck, 2 convs. Block.cs:325-366."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0,
                           name=f"m.{i}")(a, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], -1), train)


class _ConvBNParams(nn.Module):
    """Declares a folded ConvBN's leaves (conv.kernel + bn.bias) without
    running it — the fused-block Pallas path consumes them directly while
    the param tree stays identical to the unfused modules'."""

    kshape: Tuple[int, ...]
    c2: int

    @nn.compact
    def __call__(self):
        k = _KernelParam(self.kshape, name="conv")()
        b = _BiasParam(self.c2, name="bn")()
        return k, b


class _BottleneckParams(nn.Module):
    """Folded-param holder matching Bottleneck's tree (cv1 + cv2).
    hidden/k generalize to the e=0.5 (C3k2) and (1,3)-kernel (C3)
    bottleneck variants."""

    cin: int
    c: int
    hidden: Optional[int] = None
    k: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        h = self.c if self.hidden is None else self.hidden
        k1, b1 = _ConvBNParams((self.k[0], self.k[0], self.cin, h), h,
                               name="cv1")()
        k2, b2 = _ConvBNParams((self.k[1], self.k[1], h, self.c), self.c,
                               name="cv2")()
        return k1, b1, k2, b2


class _PConvBN(nn.Module):
    """TRAIN-mode ConvBN on the s2d-packed grid: the original (k,k,C,O)
    stride-1 kernel runs as its packed->packed equivalent
    (repack_s2d_kernel_p2p) with real BatchNorm over the exposed parity
    axis (packed_batch_norm). Param tree identical to ConvBN's
    (conv.kernel + bn.{scale,bias,mean,var}); stats and grads exact."""

    c2: int
    k: int = 1
    in_order: str = "p"
    out_order: str = "p"
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = True):
        c1 = x.shape[-1] // 4
        kernel = _KernelParam((self.k, self.k, c1, self.c2), name="conv")()
        keff, pad = repack_s2d_kernel_p2p(kernel, in_order=self.in_order,
                                          out_order=self.out_order)
        y = jax.lax.conv_general_dilated(
            x, keff.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = packed_batch_norm(y, train, self.out_order)
        return ACTS[self.act](y)


class _PBottleneck(nn.Module):
    """TRAIN-mode Bottleneck body on the packed grid (c-major in/out);
    the shortcut add stays in the caller, matching the folded
    _BottleneckParams consumers. Param tree identical to Bottleneck's."""

    c: int
    hidden: Optional[int] = None
    k: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = self.c if self.hidden is None else self.hidden
        y = _PConvBN(h, self.k[0], in_order="c", out_order="c",
                     name="cv1")(x, train)
        return _PConvBN(self.c, self.k[1], in_order="c", out_order="c",
                        name="cv2")(y, train)


def _packed_csp_conv(x, c2, k, train, in_order, out_order, name):
    """One packed-grid ConvBN inside a deeper-region CSP block: folded
    params + bias under fused inference, real-BN _PConvBN in train."""
    if train:
        return _PConvBN(c2, k, in_order=in_order, out_order=out_order,
                        name=name)(x, train)
    w, b = _ConvBNParams((k, k, x.shape[-1] // 4, c2), c2, name=name)()
    return _pconv_bn(x, w, b, in_order=in_order, out_order=out_order)


def _packed_csp_bottleneck(x, c, train, hidden=None, k=(3, 3), name=""):
    """Bottleneck body on the packed grid (c-major; shortcut add stays in
    the caller)."""
    if train:
        return _PBottleneck(c, hidden=hidden, k=k, name=name)(x, train)
    wm1, bm1, wm2, bm2 = _BottleneckParams(x.shape[-1] // 4, c,
                                           hidden=hidden, k=k, name=name)()
    h = _pconv_bn(x, wm1, bm1, in_order="c", out_order="c")
    return _pconv_bn(h, wm2, bm2, in_order="c", out_order="c")


class _PackedC3k(nn.Module):
    """C3k (C3 with (3,3) bottleneck kernels, Block.cs:611-620) entirely on
    the c-major packed grid — the inner block of an m/l/x C3k2 inside the
    deeper s2d region. Param tree identical to C3k's (cv1/cv2/cv3 +
    m.{i}.cv1/cv2); folded 1x1/3-tap packed convs under fused inference,
    real packed-axis BN in train. Exact (tests/test_fuse.py)."""

    c2: int
    n: int = 2
    shortcut: bool = True
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = _packed_csp_conv(x, c_, 1, train, "c", "c", "cv1")
        for i in range(self.n):
            h = _packed_csp_bottleneck(a, c_, train, k=self.k,
                                       name=f"m.{i}")
            a = a + h if self.shortcut else h
        b = _packed_csp_conv(x, c_, 1, train, "c", "c", "cv2")
        return _packed_csp_conv(jnp.concatenate([a, b], -1), self.c2, 1,
                                train, "c", "c", "cv3")


def _s2d_region_live(train: bool) -> bool:
    """Whether a pending packed tensor should be consumed on the packed
    grid in this mode (fused inference, or train under allow_train)."""
    return bool(_s2d_pending()) and (
        (not train and fused_inference_active())
        or (train and s2d_packed_train_active()))


class C2f(nn.Module):
    """Fast CSP bottleneck with n cascaded splits. Block.cs:371-399."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        # deeper-packing handshake (s2d_packed_input(deeper=True)): conv1
        # emitted its output space-to-depth packed; run the WHOLE block on
        # the packed grid — 1x1 convs as parity-diagonal packed 1x1s and
        # the 3x3/s1 bottleneck convs as 3-tap packed convs (4x dense
        # FLOPs for full MXU lanes) — and emit packed for the next
        # stride-2 ConvBN to consume. Internal tensors are c-major so the
        # reference's channel split/concat (Block.cs:371-399) stays a
        # contiguous slice; boundary tensors are p-major. Exact. Train
        # mode (allow_train) runs the same graph with real packed BN.
        if _s2d_region_live(train) and len(x.shape) == 4:
            c1 = _s2d_pending()
            _s2d_set_pending(0)
            if not (self.g == 1 and x.shape[-1] == 4 * c1):
                raise ValueError(
                    "s2d deeper packing: C2f after conv1 is not eligible "
                    f"(g={self.g}, cin={x.shape[-1]}, expected {4 * c1})")
            y0 = _packed_csp_conv(x, 2 * c, 1, train, "p", "c", "cv1")
            ys = [y0[..., :4 * c], y0[..., 4 * c:]]   # c-major: contiguous
            for i in range(self.n):
                h = _packed_csp_bottleneck(ys[-1], c, train, name=f"m.{i}")
                ys.append(ys[-1] + h if self.shortcut else h)
            out = _packed_csp_conv(jnp.concatenate(ys, -1), self.c2, 1,
                                   train, "c", "p", "cv2")
            if _s2d_deeper_left() == 0 and _s2d_final_plain():
                return depth_to_space2(out)   # skip-source block: unpack
            _s2d_set_pending(self.c2)
            return out
        if (not train and fused_inference_active() and pallas_conv_active()
                and len(x.shape) == 4):
            from ..kernels.c2f import c2f_eligible, c2f_fused

            if c2f_eligible(self.n, self.shortcut, self.g, x.shape[1],
                            x.shape[2], c, self.c2):
                cin = x.shape[-1]
                w1, b1 = _ConvBNParams((1, 1, cin, 2 * c), 2 * c,
                                       name="cv1")()
                wm1, bm1, wm2, bm2 = _BottleneckParams(c, c, name="m.0")()
                w2, b2 = _ConvBNParams((1, 1, 3 * c, self.c2), self.c2,
                                       name="cv2")()
                dt = x.dtype
                return c2f_fused(x, w1.astype(dt), b1.astype(dt),
                                 wm1.astype(dt), bm1.astype(dt),
                                 wm2.astype(dt), bm2.astype(dt),
                                 w2.astype(dt), b2.astype(dt))
        y = list(jnp.split(ConvBN(2 * c, 1, 1, name="cv1")(x, train), 2, axis=-1))
        for i in range(self.n):
            # NOTE: e=1.0 matches the reference's C# argument-order quirk
            # (Block.cs:383 `e = 1.0f` assignment inside the ctor call).
            y.append(Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0,
                                name=f"m.{i}")(y[-1], train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, -1), train)


class C3(nn.Module):
    """CSP bottleneck, 3 convs. Block.cs:404-442."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    m_kernels: Tuple[int, int] = (1, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        # deeper-packing handshake — the packed-grid rewrite for the v5u
        # layer-2 C3 (parallel cv1/cv2 1x1s + (1,3)-kernel bottlenecks +
        # cv3); same machinery as the C2f branch. Exact. Train mode
        # (allow_train) runs the same graph with real packed BN.
        if _s2d_region_live(train) and len(x.shape) == 4:
            c1 = _s2d_pending()
            _s2d_set_pending(0)
            if not (self.g == 1 and x.shape[-1] == 4 * c1):
                raise ValueError(
                    "s2d deeper packing: C3 after conv1 is not eligible "
                    f"(g={self.g}, cin={x.shape[-1]}, expected {4 * c1})")
            a = _packed_csp_conv(x, c_, 1, train, "p", "c", "cv1")
            for i in range(self.n):
                h = _packed_csp_bottleneck(a, c_, train, k=self.m_kernels,
                                           name=f"m.{i}")
                a = a + h if self.shortcut else h
            bb = _packed_csp_conv(x, c_, 1, train, "p", "c", "cv2")
            out = _packed_csp_conv(jnp.concatenate([a, bb], -1), self.c2,
                                   1, train, "c", "p", "cv3")
            if _s2d_deeper_left() == 0 and _s2d_final_plain():
                return depth_to_space2(out)   # skip-source block: unpack
            _s2d_set_pending(self.c2)
            return out
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, self.m_kernels, 1.0,
                           name=f"m.{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3x(C3):
    """C3 with (1,3) kernels — identical to the reference override
    (Block.cs:444-454, which re-registers the same Bottleneck stack)."""


class C3k(C3):
    """C3 with (3,3) bottleneck kernels. Block.cs:611-620."""

    m_kernels: Tuple[int, int] = (3, 3)


class RepC3(nn.Module):
    """Rep-style C3. Block.cs:459-494."""

    c2: int
    n: int = 3
    e: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = RepConv(c_, name=f"m.{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        y = a + b
        if c_ != self.c2:
            y = ConvBN(self.c2, 1, 1, name="cv3")(y, train)
        return y


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck stack. Block.cs:525-535."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, name=f"m.{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k or Bottleneck. Block.cs:623-662."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        # deeper-packing handshake — same packed-grid rewrite as C2f (see
        # there); covers the v11/v12 layer-2 C3k2 with plain bottlenecks
        # (c3k=False, the n/s sizes). Exact. Train mode (allow_train)
        # runs the same graph with real packed BN.
        if _s2d_region_live(train) and len(x.shape) == 4:
            c1 = _s2d_pending()
            _s2d_set_pending(0)
            if not (self.g == 1 and x.shape[-1] == 4 * c1):
                raise ValueError(
                    "s2d deeper packing: C3k2 after conv1 is not eligible "
                    f"(g={self.g}, cin={x.shape[-1]}, "
                    f"expected {4 * c1})")
            y0 = _packed_csp_conv(x, 2 * c, 1, train, "p", "c", "cv1")
            ys = [y0[..., :4 * c], y0[..., 4 * c:]]
            for i in range(self.n):
                if self.c3k:
                    # m/l/x inner block: a full C3k on the packed grid
                    # (shortcut handled inside, as in the plain path)
                    ys.append(_PackedC3k(c, 2, self.shortcut,
                                         name=f"m.{i}")(ys[-1], train))
                    continue
                h = _packed_csp_bottleneck(ys[-1], c, train,
                                           hidden=int(c * 0.5),
                                           name=f"m.{i}")
                ys.append(ys[-1] + h if self.shortcut else h)
            out = _packed_csp_conv(jnp.concatenate(ys, -1), self.c2, 1,
                                   train, "c", "p", "cv2")
            if _s2d_deeper_left() == 0 and _s2d_final_plain():
                return depth_to_space2(out)   # skip-source block: unpack
            _s2d_set_pending(self.c2)
            return out
        y = list(jnp.split(ConvBN(2 * c, 1, 1, name="cv1")(x, train), 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                y.append(C3k(c, 2, self.shortcut, self.g, name=f"m.{i}")(y[-1], train))
            else:
                y.append(Bottleneck(c, self.shortcut, self.g, (3, 3), 0.5,
                                    name=f"m.{i}")(y[-1], train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, -1), train)


class SCDown(nn.Module):
    """Separable downsample (v10-style). Block.cs:812-827."""

    c2: int
    k: int
    s: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        return ConvBN(self.c2, self.k, self.s, g=self.c2, name="cv2")(y, train)


class RepVGGDW(nn.Module):
    """Dual-branch depthwise 7x7 + 3x3. Block.cs:1120-1139."""

    ed: int
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBN(self.ed, 7, 1, 3, g=self.ed, act=self.act, name="conv")(x, train)
        b = ConvBN(self.ed, 3, 1, 1, g=self.ed, act=self.act, name="conv1")(x, train)
        return ACTS["silu"](a + b)


class CIB(nn.Module):
    """Conditional identity block. Block.cs:861-883."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c = int(self.c2 * self.e)
        y = ConvBN(c1, 3, g=c1, name="cv1.0")(x, train)
        y = ConvBN(2 * c, 1, name="cv1.1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c, name="cv1.2")(y, train)
        else:
            y = ConvBN(2 * c, 3, g=2 * c, name="cv1.2")(y, train)
        y = ConvBN(self.c2, 1, name="cv1.3")(y, train)
        y = ConvBN(self.c2, 3, g=self.c2, name="cv1.4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f with CIB blocks. Block.cs:829-859."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = list(jnp.split(ConvBN(2 * c, 1, 1, name="cv1")(x, train), 2, axis=-1))
        for i in range(self.n):
            y.append(CIB(c, self.shortcut, 1.0, self.lk, name=f"m.{i}")(y[-1], train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, -1), train)


class HGStem(nn.Module):
    """PPHGNetV2 stem. Block.cs:90-137."""

    cm: int
    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.cm, 3, 2, act="relu", name="stem1")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.cm // 2, 2, 1, 0, act="relu", name="stem2a")(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.cm, 2, 1, 0, act="relu", name="stem2b")(x2, train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1))
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN(self.cm, 3, 2, act="relu", name="stem3")(x, train)
        return ConvBN(self.c2, 1, 1, act="relu", name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block. Block.cs:143-189."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = [x]
        for i in range(self.n):
            block = (LightConv(self.cm, self.k, act=self.act, name=f"m.{i}")
                     if self.lightconv else
                     ConvBN(self.cm, self.k, act=self.act, name=f"m.{i}"))
            y.append(block(y[-1], train))
        out = ConvBN(self.c2 // 2, 1, 1, act=self.act, name="sc")(
            jnp.concatenate(y, -1), train)
        out = ConvBN(self.c2, 1, 1, act=self.act, name="ec")(out, train)
        return out + x if self.shortcut and x.shape[-1] == self.c2 else out


class Proto(nn.Module):
    """Segmentation prototype head. Block.cs:51-84."""

    c_: int = 256
    c2: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c_, 3, name="cv1")(x, train)
        y = ConvTranspose2dRaw(self.c_, 2, 2, 0, name="upsample")(y)
        y = ConvBN(self.c_, 3, name="cv2")(y, train)
        return ConvBN(self.c2, 1, name="cv3")(y, train)


class AGLU(nn.Module):
    """Adaptive Gated Linear Unit activation: exp((1/lam) * softplus_{beta=-1}
    (kappa*x - log lam)) with learnable scalars. Activation.cs:15-38."""

    @nn.compact
    def __call__(self, x):
        lambd = self.param("lambd", nn.initializers.uniform(1.0), (1,))
        kappa = self.param("kappa", nn.initializers.uniform(1.0), (1,))
        lam = jnp.clip(lambd, 0.0001)
        # torch Softplus(beta=-1): (1/beta) * log(1 + exp(beta*x)) = -log1p(exp(-x))
        gate = -jnp.log1p(jnp.exp(-(kappa * x - jnp.log(lam))))
        return jnp.exp(gate / lam)


def upsample2x(x):
    """Nearest-neighbor 2x upsample (exact torch Upsample nearest)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
