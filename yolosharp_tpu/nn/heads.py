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
