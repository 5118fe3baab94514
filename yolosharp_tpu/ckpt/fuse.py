"""Pure-params transforms: detection-head bias priors, Conv+BN folding.

bias_init: the reference's Head.Detect.bias_init (Head.cs:129-150) builds
lazy LINQ queries that are never enumerated — a silent no-op. We implement
the initialization those lines intend (the Ultralytics prior): box-branch
final bias = 1.0, cls-branch final bias = log(5/nc / (640/stride)^2) per
level, mirrored onto one2one towers for E2E heads.

fold_bn: inference-time Conv+BN fusion equivalent to the reference's
fuse()/forward_fuse (Convs.cs:58-61): kernel' = kernel * gamma/sqrt(var+eps)
and the affine remainder is left in a now-trivial BN (scale=1, mean=0,
var=1-eps), keeping the tree structure unchanged so fused params remain
checkpoint-compatible.
"""

from __future__ import annotations

import math
import re

import numpy as np

from .mapping import flatten, head_index, unflatten

STRIDES = (8, 16, 32)


def bias_init(variables, nc: int, imgsz: int = 640):
    """Detection-prior head bias init; returns new variables."""
    params = flatten(variables["params"])
    hidx = head_index(variables["params"])
    for key in list(params):
        m = re.match(rf"^{hidx}\.(one2one_)?(cv2|cv3)\.(\d)\.2\.bias$", key)
        if not m:
            continue
        level = int(m.group(3))
        if m.group(2) == "cv2":
            params[key] = np.full_like(np.asarray(params[key]), 1.0)
        else:
            val = math.log(5 / nc / (imgsz / STRIDES[level]) ** 2)
            params[key] = np.full_like(np.asarray(params[key]), val)
    out = dict(variables)
    out["params"] = unflatten(params, variables["params"])
    return out


def fold_bn(variables, eps: float = 1e-3):
    """Fold BN statistics into the preceding conv kernels (inference only).

    Handles every foldable module shape in the zoo:
     - ConvBN / DWConv:  {stem}.conv.kernel
     - Conv2:            {stem}.conv.kernel AND {stem}.cv2.kernel (both
       branches feed the shared BN, so both scale by gamma/sqrt(var+eps))
     - ConvTranspose:    {stem}.conv_transpose.kernel (HWIO, O last)
    RepConv's optional identity-branch BN has no conv to fold into and is
    left untouched (nn.common keeps it a real BatchNorm in fused mode).

    The folded tree stays checkpoint-compatible: a trivial BN remains
    (scale=1, mean=0, var=1-eps, bias=b'), and nn.common.fused_inference()
    can skip it entirely as a bias add.
    """
    params = flatten(variables["params"])
    stats = flatten(variables.get("batch_stats", {}))
    for key in list(params):
        if not key.endswith(".bn.scale"):
            continue
        stem = key[: -len(".bn.scale")]
        kernels = [k for k in (f"{stem}.conv.kernel", f"{stem}.cv2.kernel",
                               f"{stem}.conv_transpose.kernel")
                   if k in params]
        if not kernels or f"{stem}.bn.mean" not in stats:
            continue
        gamma = np.asarray(params[key], np.float32)
        beta = np.asarray(params[f"{stem}.bn.bias"], np.float32)
        mean = np.asarray(stats[f"{stem}.bn.mean"], np.float32)
        var = np.asarray(stats[f"{stem}.bn.var"], np.float32)
        mul = gamma / np.sqrt(var + eps)
        for kkey in kernels:
            # HWIO: broadcast over the output-channel (last) axis
            params[kkey] = np.asarray(params[kkey], np.float32) * mul
        # leave a trivial BN: y = (x - 0) * 1/sqrt((1-eps)+eps) * 1 + b'
        params[key] = np.ones_like(gamma)
        params[f"{stem}.bn.bias"] = beta - mean * mul
        stats[f"{stem}.bn.mean"] = np.zeros_like(mean)
        stats[f"{stem}.bn.var"] = np.ones_like(var) - eps
    out = dict(variables)
    out["params"] = unflatten(params, variables["params"])
    if "batch_stats" in variables:
        out["batch_stats"] = unflatten(stats, variables["batch_stats"])
    return out
