"""Segmentation mask ops: crop to boxes, decode from prototypes.

Functional parity targets: YoloSharp/Utils/Ops.cs:409-489 (crop_mask,
process_mask). Always the vectorized grid-compare path (the reference's
per-box host loop for small n, Ops.cs:422-436, is a CPU special case that
does not belong on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside each xyxy box. masks (N,H,W), boxes (N,4)."""
    _n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # (N,1,1)
    r = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    c = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    inside = (r >= x1) & (r < x2) & (c >= y1) & (c < y2)
    return masks * inside


def process_mask(protos: jnp.ndarray, masks_in: jnp.ndarray,
                 bboxes: jnp.ndarray, shape, upsample: bool = False) -> jnp.ndarray:
    """Decode instance masks from prototypes + coefficients.

    protos (C, mh, mw), masks_in (N, C), bboxes xyxy (N, 4) at input-image
    scale, shape = (ih, iw). Returns binary masks (N, ih, iw) if upsample
    else (N, mh, mw).
    """
    c, mh, mw = protos.shape
    ih, iw = shape
    masks = (masks_in @ protos.reshape(c, -1).astype(jnp.float32)).reshape(-1, mh, mw)
    ratio = jnp.asarray([mw / iw, mh / ih, mw / iw, mh / ih], dtype=bboxes.dtype)
    masks = crop_mask(masks, bboxes * ratio)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
    return masks > 0.0
