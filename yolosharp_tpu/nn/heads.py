"""Task heads: Detect / Segment / Obb / Pose / Classify.

Functional parity targets: YoloSharp/Modules/Head.cs:8-644. The heads here
return RAW per-level maps (NHWC); all decoding (DFL integral, anchor
arithmetic, sigmoid, top-k E2E select, NMS) lives in pure jnp functions in
`yolosharp_tpu/predict.py` so a single jitted graph fuses head + decode.

End2End: the one2one branch runs on stop_gradient(feats) exactly like the
reference's detached second pass (Head.cs:92-101).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
from flax import linen as nn

from .common import Conv2d, ConvBN, DWConv


class _Branch(nn.Module):
    """Conv-Conv-Conv2d tower ending in `out` channels (one FPN level)."""

    mid: int
    out: int
    legacy: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.legacy:
            x = ConvBN(self.mid, 3, name="0")(x, train)
            x = ConvBN(self.mid, 3, name="1")(x, train)
        else:
            x = DWConv(x.shape[-1], 3, name="0.0")(x, train)
            x = ConvBN(self.mid, 1, name="0.1")(x, train)
            x = DWConv(self.mid, 3, name="1.0")(x, train)
            x = ConvBN(self.mid, 1, name="1.1")(x, train)
        return Conv2d(self.out, 1, use_bias=True, name="2")(x)


class _BranchFolded(nn.Module):
    """Folded-param holder matching the legacy _Branch tree (ConvBN 0/1 +
    Conv2d 2) — consumed by the head_fuse path, which runs the convs
    itself so the two towers' first convs can share one kernel."""

    cin: int
    mid: int
    out: int

    @nn.compact
    def __call__(self):
        from .common import _Conv2dParams, _ConvBNParams

        k0, b0 = _ConvBNParams((3, 3, self.cin, self.mid), self.mid,
                               name="0")()
        k1, b1 = _ConvBNParams((3, 3, self.mid, self.mid), self.mid,
                               name="1")()
        k2, b2 = _Conv2dParams((1, 1, self.mid, self.out), name="2")()
        return k0, b0, k1, b1, k2, b2


def _raw_conv(x, k, b):
    """Plain NHWC conv + bias (no activation)."""
    p = k.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


class _SimpleBranch(nn.Module):
    """Conv-Conv-Conv2d tower (always legacy style) for cv4 extras."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.mid, 3, name="0")(x, train)
        x = ConvBN(self.mid, 3, name="1")(x, train)
        return Conv2d(self.out, 1, use_bias=True, name="2")(x)


class Detect(nn.Module):
    """Anchor-free detection head (box DFL + cls towers per level)."""

    nc: int = 80
    reg_max: int = 16
    ch: Tuple[int, ...] = (64, 128, 256)
    legacy: bool = True
    end2end: bool = False

    def head_dims(self):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        return c2, c3

    @nn.compact
    def __call__(self, feats, train: bool = False,
                 skip_one2many: bool = False) -> Dict:
        c2, c3 = self.head_dims()
        nl = len(self.ch)

        def run(prefix, xs):
            from .common import fused_inference_active, head_fuse_active

            if (head_fuse_active() and fused_inference_active()
                    and not train and self.legacy):
                # per-level cv2/cv3 first convs share the input: run ONE
                # (c2+c3)-channel 3x3 and split — exact (output-axis
                # kernel concat); folded-inference only (head_fuse)
                import jax.numpy as jnp

                boxes, clss = [], []
                for i in range(nl):
                    x = xs[i]
                    cin = x.shape[-1]
                    f2 = _BranchFolded(cin, c2, 4 * self.reg_max,
                                       name=f"{prefix}cv2.{i}")()
                    f3 = _BranchFolded(cin, c3, self.nc,
                                       name=f"{prefix}cv3.{i}")()
                    kcat = jnp.concatenate([f2[0], f3[0]], -1)
                    bcat = jnp.concatenate([f2[1], f3[1]], -1)
                    y = jax.nn.silu(_raw_conv(x, kcat, bcat))
                    y2, y3 = y[..., :c2], y[..., c2:]
                    y2 = jax.nn.silu(_raw_conv(y2, f2[2], f2[3]))
                    boxes.append(_raw_conv(y2, f2[4], f2[5]))
                    y3 = jax.nn.silu(_raw_conv(y3, f3[2], f3[3]))
                    clss.append(_raw_conv(y3, f3[4], f3[5]))
                return {"box": tuple(boxes), "cls": tuple(clss)}
            boxes = tuple(
                _Branch(c2, 4 * self.reg_max, True, name=f"{prefix}cv2.{i}")(
                    xs[i], train) for i in range(nl))
            clss = tuple(
                _Branch(c3, self.nc, self.legacy, name=f"{prefix}cv3.{i}")(
                    xs[i], train) for i in range(nl))
            return {"box": boxes, "cls": clss}

        preds = {}
        if not (skip_one2many and self.end2end):
            preds["one2many"] = run("", feats)
        if self.end2end:
            detached = tuple(jax.lax.stop_gradient(f) for f in feats)
            preds["one2one"] = run("one2one_", detached)
        return preds


class Segment(Detect):
    """Detect + prototype masks + per-level mask-coefficient towers."""

    nm: int = 32
    npr: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False,
                 skip_one2many: bool = False) -> Dict:
        from .common import Proto

        c2, c3 = self.head_dims()
        c4 = max(self.ch[0] // 4, self.nm)
        nl = len(self.ch)

        def run(prefix, xs):
            boxes = tuple(
                _Branch(c2, 4 * self.reg_max, True, name=f"{prefix}cv2.{i}")(
                    xs[i], train) for i in range(nl))
            clss = tuple(
                _Branch(c3, self.nc, self.legacy, name=f"{prefix}cv3.{i}")(
                    xs[i], train) for i in range(nl))
            masks = tuple(
                _SimpleBranch(c4, self.nm, name=f"{prefix}cv4.{i}")(
                    xs[i], train) for i in range(nl))
            return {"box": boxes, "cls": clss, "mask": masks}

        # proto is shared: still needed by one2one mask decode when the
        # one2many towers are skipped (NMS-free predict, Head.cs:117-127)
        proto = Proto(self.npr, self.nm, name="proto")(feats[0], train)
        preds = {}
        if not (skip_one2many and self.end2end):
            preds["one2many"] = dict(run("", feats), proto=proto)
        if self.end2end:
            detached = tuple(jax.lax.stop_gradient(f) for f in feats)
            preds["one2one"] = dict(run("one2one_", detached),
                                    proto=jax.lax.stop_gradient(proto))
        return preds


class Obb(Detect):
    """Detect + angle tower. Angle transform (sigmoid - 0.25) * pi is applied
    here, matching forward_head (Head.cs:420-432)."""

    ne: int = 1

    @nn.compact
    def __call__(self, feats, train: bool = False,
                 skip_one2many: bool = False) -> Dict:
        import math

        c2, c3 = self.head_dims()
        c4 = max(self.ch[0] // 4, self.ne)
        nl = len(self.ch)

        def run(prefix, xs):
            boxes = tuple(
                _Branch(c2, 4 * self.reg_max, True, name=f"{prefix}cv2.{i}")(
                    xs[i], train) for i in range(nl))
            clss = tuple(
                _Branch(c3, self.nc, self.legacy, name=f"{prefix}cv3.{i}")(
                    xs[i], train) for i in range(nl))
            angles = tuple(
                (jax.nn.sigmoid(
                    _SimpleBranch(c4, self.ne, name=f"{prefix}cv4.{i}")(
                        xs[i], train)) - 0.25) * math.pi
                for i in range(nl))
            return {"box": boxes, "cls": clss, "angle": angles}

        preds = {}
        if not (skip_one2many and self.end2end):
            preds["one2many"] = run("", feats)
        if self.end2end:
            detached = tuple(jax.lax.stop_gradient(f) for f in feats)
            preds["one2one"] = run("one2one_", detached)
        return preds


class Pose(Detect):
    """Detect + keypoint tower (raw kpt maps; decode in predict/loss)."""

    kpt_num: int = 17
    kpt_dim: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False,
                 skip_one2many: bool = False) -> Dict:
        c2, c3 = self.head_dims()
        nk = self.kpt_num * self.kpt_dim
        c4 = max(self.ch[0] // 4, nk)
        nl = len(self.ch)

        def run(prefix, xs):
            boxes = tuple(
                _Branch(c2, 4 * self.reg_max, True, name=f"{prefix}cv2.{i}")(
                    xs[i], train) for i in range(nl))
            clss = tuple(
                _Branch(c3, self.nc, self.legacy, name=f"{prefix}cv3.{i}")(
                    xs[i], train) for i in range(nl))
            kpts = tuple(
                _SimpleBranch(c4, nk, name=f"{prefix}cv4.{i}")(
                    xs[i], train) for i in range(nl))
            return {"box": boxes, "cls": clss, "kpt": kpts}

        preds = {}
        if not (skip_one2many and self.end2end):
            preds["one2many"] = run("", feats)
        if self.end2end:
            detached = tuple(jax.lax.stop_gradient(f) for f in feats)
            preds["one2one"] = run("one2one_", detached)
        return preds


class Classify(nn.Module):
    """Conv + global-average-pool + linear classifier. Head.cs:612-644."""

    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict:
        from .common import torch_bias_init, torch_linear_init

        c_ = 1280
        y = ConvBN(c_, self.k, self.s, name="conv")(x, train)
        y = y.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        # (in, out) 2-D — transposed torch nn.Linear layout (mapping.py
        # round-trips the transpose for C#-readable .bin files)
        kern = self.param("linear.weight", torch_linear_init,
                          (c_, self.c2))
        bias = self.param("linear.bias", torch_bias_init(c_), (self.c2,))
        return {"cls": y @ kern + bias}
