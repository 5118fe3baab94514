"""Model assembly: the 16 architectures ({v8, v5u, v11, v12} x {detect,
segment, obb, pose, classify}) as one flax.linen module.

Functional parity target: YoloSharp/Models/Yolo.cs:10-592. Layer lists,
width/depth multiples, skip tables (outputIndexs/concatIndex) and channel
math are identical so checkpoints load by name; the execution model is a
single traced NHWC graph, not a per-layer dispatch loop.

Layer modules are named "0".."N" and their parameter paths mirror the
Ultralytics/YoloSharp state-dict names ("model.{i}.{...}" minus the "model."
prefix; see ckpt/mapping.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax.numpy as jnp
from flax import linen as nn

from . import heads as H
from .attention import A2C2f, C2PSA
from .common import C2f, C3, C3k2, ConvBN, SPPF, upsample2x

UP = ("up",)
CAT = ("cat",)


class ArchCfg(NamedTuple):
    """Static architecture configuration (hashable; safe as a linen field)."""

    version: str = "v8"        # v8 | v5u | v11 | v12
    size: str = "n"            # n s m l x
    task: str = "detect"       # detect segment obb pose classify
    nc: int = 80
    reg_max: int = 16
    kpt_num: int = 17
    kpt_dim: int = 3
    end2end: bool = False


def _widths(wm: float, max_channels: int | None) -> Tuple[int, ...]:
    base = (64, 128, 256, 512, 1024)
    if max_channels is None:
        return tuple(int(w * wm) for w in base)
    return tuple(min(int(w * wm), max_channels) for w in base)


def _v8_layers(size: str):
    dm, wm, maxc = {
        "n": (0.34, 0.25, 1024), "s": (0.34, 0.5, 1024),
        "m": (0.67, 0.75, 576), "l": (1.0, 1.0, 512), "x": (1.0, 1.25, 640),
    }[size]
    w = _widths(wm, maxc)
    d = tuple(int(x * dm) for x in (3, 6, 9))
    layers = [
        ("mod", partial(ConvBN, w[0], 3, 2)),
        ("mod", partial(ConvBN, w[1], 3, 2)),
        ("mod", partial(C2f, w[1], d[0], True)),
        ("mod", partial(ConvBN, w[2], 3, 2)),
        ("mod", partial(C2f, w[2], d[1], True)),
        ("mod", partial(ConvBN, w[3], 3, 2)),
        ("mod", partial(C2f, w[3], d[1], True)),
        ("mod", partial(ConvBN, w[4], 3, 2)),
        ("mod", partial(C2f, w[4], d[0], True)),
        ("mod", partial(SPPF, w[4], 5)),
        UP, CAT,
        ("mod", partial(C2f, w[3], d[0])),
        UP, CAT,
        ("mod", partial(C2f, w[2], d[0])),
        ("mod", partial(ConvBN, w[2], 3, 2)), CAT,
        ("mod", partial(C2f, w[3], d[0])),
        ("mod", partial(ConvBN, w[3], 3, 2)), CAT,
        ("mod", partial(C2f, w[4], d[0])),
    ]
    return layers, (4, 6, 9, 12, 15, 18, 21), (1, 0, 3, 2), w, True


def _v5u_layers(size: str):
    dm, wm = {
        "n": (0.34, 0.25), "s": (0.34, 0.5), "m": (0.67, 0.75),
        "l": (1.0, 1.0), "x": (1.34, 1.25),
    }[size]
    w = _widths(wm, None)
    d = tuple(int(x * dm) for x in (3, 6, 9))
    layers = [
        ("mod", partial(ConvBN, w[0], 6, 2, 2)),
        ("mod", partial(ConvBN, w[1], 3, 2)),
        ("mod", partial(C3, w[1], d[0])),
        ("mod", partial(ConvBN, w[2], 3, 2)),
        ("mod", partial(C3, w[2], d[1])),
        ("mod", partial(ConvBN, w[3], 3, 2)),
        ("mod", partial(C3, w[3], d[2])),
        ("mod", partial(ConvBN, w[4], 3, 2)),
        ("mod", partial(C3, w[4], d[0])),
        ("mod", partial(SPPF, w[4], 5)),
        ("mod", partial(ConvBN, w[3], 1, 1)),
        UP, CAT,
        ("mod", partial(C3, w[3], d[0], False)),
        ("mod", partial(ConvBN, w[2], 1, 1)),
        UP, CAT,
        ("mod", partial(C3, w[2], d[0], False)),
        ("mod", partial(ConvBN, w[2], 3, 2)), CAT,
        ("mod", partial(C3, w[3], d[0], False)),
        ("mod", partial(ConvBN, w[3], 3, 2)), CAT,
        ("mod", partial(C3, w[4], d[0], False)),
    ]
    return layers, (4, 6, 10, 14, 17, 20, 23), (1, 0, 3, 2), w, True


def _v11_layers(size: str):
    dm, wm, maxc, use_c3k = {
        "n": (0.5, 0.25, 1024, False), "s": (0.5, 0.5, 1024, False),
        "m": (0.5, 1.0, 512, True), "l": (1.0, 1.0, 512, True),
        "x": (1.0, 1.5, 768, True),
    }[size]
    w = _widths(wm, maxc)
    ds = int(2 * dm)
    layers = [
        ("mod", partial(ConvBN, w[0], 3, 2)),
        ("mod", partial(ConvBN, w[1], 3, 2)),
        ("mod", partial(C3k2, w[2], ds, use_c3k, 0.25)),
        ("mod", partial(ConvBN, w[2], 3, 2)),
        ("mod", partial(C3k2, w[3], ds, use_c3k, 0.25)),
        ("mod", partial(ConvBN, w[3], 3, 2)),
        ("mod", partial(C3k2, w[3], ds, True)),
        ("mod", partial(ConvBN, w[4], 3, 2)),
        ("mod", partial(C3k2, w[4], ds, True)),
        ("mod", partial(SPPF, w[4], 5)),
        ("mod", partial(C2PSA, w[4], ds)),
        UP, CAT,
        ("mod", partial(C3k2, w[3], ds, use_c3k)),
        UP, CAT,
        ("mod", partial(C3k2, w[2], ds, use_c3k)),
        ("mod", partial(ConvBN, w[2], 3, 2)), CAT,
        ("mod", partial(C3k2, w[3], ds, use_c3k)),
        ("mod", partial(ConvBN, w[3], 3, 2)), CAT,
        ("mod", partial(C3k2, w[4], ds, True)),
    ]
    return layers, (4, 6, 10, 13, 16, 19, 22), (1, 0, 3, 2), w, False


def _v12_layers(size: str):
    dm, wm, maxc, use_c3k, n_mult, residual, mlp_ratio = {
        "n": (0.5, 0.25, 1024, False, 1, False, 2.0),
        "s": (0.5, 0.5, 1024, False, 1, False, 2.0),
        "m": (0.5, 1.0, 512, True, 1, False, 2.0),
        "l": (1.0, 1.0, 512, True, 2, True, 1.2),
        "x": (1.0, 1.5, 768, True, 2, True, 1.2),
    }[size]
    w = _widths(wm, maxc)
    ds = int(2 * dm)
    a2 = partial(A2C2f, mlp_ratio=mlp_ratio, residual=residual)
    layers = [
        ("mod", partial(ConvBN, w[0], 3, 2)),
        ("mod", partial(ConvBN, w[1], 3, 2)),
        ("mod", partial(C3k2, w[2], ds, use_c3k, 0.25)),
        ("mod", partial(ConvBN, w[2], 3, 2)),
        ("mod", partial(C3k2, w[3], ds, use_c3k, 0.25)),
        ("mod", partial(ConvBN, w[3], 3, 2)),
        ("mod", partial(a2, w[3], 2 * n_mult, True, 4)),
        ("mod", partial(ConvBN, w[4], 3, 2)),
        ("mod", partial(a2, w[4], 2 * n_mult, True, 1)),
        UP, CAT,
        ("mod", partial(a2, w[3], n_mult, False, -1)),
        UP, CAT,
        ("mod", partial(a2, w[2], n_mult, False, -1)),
        ("mod", partial(ConvBN, w[2], 3, 2)), CAT,
        ("mod", partial(a2, w[3], n_mult, False, -1)),
        ("mod", partial(ConvBN, w[3], 3, 2)), CAT,
        ("mod", partial(C3k2, w[4], ds, True)),
    ]
    return layers, (4, 6, 8, 11, 14, 17, 20), (1, 0, 3, 2), w, False


_BUILDERS = {"v8": _v8_layers, "v5u": _v5u_layers,
             "v11": _v11_layers, "v12": _v12_layers}

# how many trailing layers the classify variants drop (Yolo.cs:518-592)
_CLS_KEEP = {"v8": 9, "v5u": 11, "v11": 11, "v12": 11}


def build_arch(cfg: ArchCfg):
    """Returns (layer_defs, out_idx, concat_idx) incl. the task head."""
    layers, out_idx, concat_idx, w, legacy = _BUILDERS[cfg.version](cfg.size)
    ch = (w[2], w[3], w[4])
    if cfg.task == "classify":
        # v12 classify derives from the v11 trunk (Yolo.cs:575-592)
        if cfg.version == "v12":
            layers, out_idx, concat_idx, w, legacy = _v11_layers(cfg.size)
        layers = layers[: _CLS_KEEP[cfg.version if cfg.version != "v12" else "v11"]]
        layers.append(("head", partial(H.Classify, cfg.nc)))
        return layers, out_idx, concat_idx

    common = dict(nc=cfg.nc, reg_max=cfg.reg_max, ch=ch, legacy=legacy,
                  end2end=cfg.end2end)
    if cfg.task == "detect":
        head = partial(H.Detect, **common)
    elif cfg.task == "segment":
        head = partial(H.Segment, nm=32, npr=ch[0], **common)
    elif cfg.task == "obb":
        head = partial(H.Obb, ne=1, **common)
    elif cfg.task == "pose":
        head = partial(H.Pose, kpt_num=cfg.kpt_num, kpt_dim=cfg.kpt_dim,
                       **common)
    else:
        raise ValueError(f"unknown task {cfg.task}")
    layers.append(("head", head))
    return layers, out_idx, concat_idx


STRIDES = (8, 16, 32)


class YoloNet(nn.Module):
    """Single-module YOLO network. __call__ returns the head's preds dict.

    Input x: (B, H, W, 3) float, already normalized to [0, 1].
    """

    cfg: ArchCfg

    @nn.compact
    def __call__(self, x, train: bool = False, skip_one2many: bool = False):
        """skip_one2many: E2E inference-only mode — the one2many towers are
        not executed (they are dead weight at NMS-free predict time)."""
        layers, out_idx, concat_idx = build_arch(self.cfg)
        out_idx = set(out_idx)
        outputs, cat_count = [], 0
        for i, d in enumerate(layers):
            kind = d[0]
            if kind == "up":
                x = upsample2x(x)
            elif kind == "cat":
                x = jnp.concatenate([x, outputs[concat_idx[cat_count]]], -1)
                cat_count += 1
            elif kind == "head":
                mod = d[1](name=str(i))
                if self.cfg.task == "classify":
                    return mod(x, train)
                if skip_one2many and self.cfg.end2end:
                    return mod(tuple(outputs[-3:]), train,
                               skip_one2many=True)
                return mod(tuple(outputs[-3:]), train)
            else:
                x = d[1](name=str(i))(x, train)
            if i in out_idx:
                outputs.append(x)
        raise AssertionError("architecture has no head layer")


def feat_shapes(imgsz: Tuple[int, int]):
    """(H, W) of the three FPN levels for an input size."""
    return tuple((imgsz[0] // s, imgsz[1] // s) for s in STRIDES)
