"""IoU family: pairwise box IoU, CIoU/DIoU/GIoU, probiou (OBB), mask/kpt IoU.

Functional parity targets: YoloSharp/Utils/Metrics.cs:16-283 (box_iou,
bbox_iou, mask_iou, probiou, batch_probiou, kpt_iou, _get_covariance_matrix).
All are branch-free jnp and safe under jit/vmap/grad.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:4]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0).prod(-1)
    area1 = (a2 - a1).prod(-1)
    area2 = (b2 - b1).prod(-1)
    return inter / (area1 + area2 - inter + eps)


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = True,
             GIoU: bool = False, DIoU: bool = False, CIoU: bool = False,
             eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU of aligned boxes (..., 4) -> (..., 1).

    CIoU alpha is computed outside the gradient tape (stop_gradient), matching
    the torch `with torch.no_grad()` semantics the Ultralytics formula uses.
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, jnp.clip(b1_y2 - b1_y1, eps)
        w2, h2 = b2_x2 - b2_x1, jnp.clip(b2_y2 - b2_y1, eps)

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                    + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = 4 / math.pi**2 * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def mask_iou(mask1: jnp.ndarray, mask2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(N, HW) x (M, HW) binary masks -> (N, M) IoU. MXU-friendly matmul."""
    inter = jnp.clip(mask1 @ mask2.T, 0)
    union = mask1.sum(1)[:, None] + mask2.sum(1)[None, :] - inter
    return inter / (union + eps)


def _covariance(obb: jnp.ndarray):
    """Gaussian-box covariance terms (a, b, c) of xywhr boxes (..., 5)."""
    a = obb[..., 2:3] ** 2 / 12.0
    b = obb[..., 3:4] ** 2 / 12.0
    r = obb[..., 4:5]
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def _probiou_terms(x1, y1, a1, b1, c1, x2, y2, a2, b2, c2, eps):
    t1 = (((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2)
          / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps)) * 0.25
    t2 = (((c1 + c2) * (x2 - x1) * (y1 - y2))
          / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps)) * 0.5
    t3 = jnp.log(((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
                 / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0)
                                 * jnp.clip(a2 * b2 - c2**2, 0)) + eps)
                 + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, CIoU: bool = False,
            eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise probabilistic IoU of aligned xywhr OBBs (..., 5) -> (..., 1).

    Bhattacharyya-distance Gaussian IoU (https://arxiv.org/abs/2106.06072).
    """
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]
    x2, y2 = obb2[..., 0:1], obb2[..., 1:2]
    a1, b1, c1 = _covariance(obb1)
    a2, b2, c2 = _covariance(obb2)
    iou = _probiou_terms(x1, y1, a1, b1, c1, x2, y2, a2, b2, c2, eps)
    if CIoU:
        w1, h1 = obb1[..., 2:3], obb1[..., 3:4]
        w2, h2 = obb2[..., 2:3], obb2[..., 3:4]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def batch_probiou(obb1: jnp.ndarray, obb2: jnp.ndarray,
                  eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise probiou: (N, 5) x (M, 5) -> (N, M)."""
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]          # (N, 1)
    x2, y2 = obb2[..., 0][None, :], obb2[..., 1][None, :]  # (1, M)
    a1, b1, c1 = _covariance(obb1)                    # (N, 1)
    a2, b2, c2 = _covariance(obb2)
    a2, b2, c2 = a2[..., 0][None, :], b2[..., 0][None, :], c2[..., 0][None, :]
    return _probiou_terms(x1, y1, a1, b1, c1, x2, y2, a2, b2, c2, eps)


def kpt_iou(kpt1: jnp.ndarray, kpt2: jnp.ndarray, area: jnp.ndarray,
            sigma: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Object Keypoint Similarity (OKS): (N,K,3) x (M,K,2|3) -> (N, M)."""
    d = ((kpt1[:, None, :, 0] - kpt2[None, :, :, 0]) ** 2
         + (kpt1[:, None, :, 1] - kpt2[None, :, :, 1]) ** 2)  # (N, M, K)
    sigma = jnp.asarray(sigma, dtype=kpt1.dtype)
    kpt_mask = kpt1[..., 2] != 0  # (N, K)
    e = d / ((2 * sigma) ** 2 * (area[:, None, None] + eps) * 2)
    return ((jnp.exp(-e) * kpt_mask[:, None]).sum(-1)
            / (kpt_mask.sum(-1)[:, None] + eps))
