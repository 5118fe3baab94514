"""Device-side batched train augmentation (mosaic + perspective + flips +
HSV as ONE jitted gather/sample program).

Round-1's host path (cv2 per sample under the GIL, data/augment.py) capped
the train loop at ~25% of the device step rate (BASELINE.md). Here the
host only *plans*: it draws the random parameters and runs the (tiny)
label geometry — the exact numpy formulas of augment.py / Augment.cs — and
ships per-batch parameter arrays; all pixel work (the expensive part)
happens on device, batched:

  out[p] = HSV( sample( src[tile(q)], q - pad[tile(q)] ) ),
  q = M^-1 @ flip(p)

which is the mosaic canvas compose (Augment.cs:147-275) fused with the
RandomPerspective warp (Augment.cs:395-538) and the flips into a single
bilinear gather — one interpolation, like the reference's one warp over
the integer-aligned canvas. Differences vs the host path live only on
1-px tile seams (cv2 blends across tiles there; we clamp into the 114
border).

Partner sampling: by default mosaic partners are drawn from the current
BATCH/shard (the reference draws dataset-wide, YoloDataset.cs:65). With a
shuffled loader the batch is itself a uniform random sample, so the
partner distribution matches up to within-epoch sampling without
replacement. `Config.mosaic_partner_pool = E` restores dataset-wide
sampling at a measured transfer cost: each shard group ships E extra
images drawn uniformly from the whole dataset and partners are drawn
from the enlarged pool (extras_per_group below) — E ~= 3x group size
makes the pool majority-dataset-wide; the default E=0 keeps the
batch-local optimization.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Sequence

import numpy as np

from .labels import LabelRecord


class MosaicPlan(NamedTuple):
    """Per-batch device augmentation parameters (all numpy, batch-leading)."""

    src_idx: np.ndarray    # (B, 4) int32 — batch positions of the 4 tiles
    rects: np.ndarray      # (B, 4, 4) f32 — canvas [x1a, y1a, x2a, y2a]
    pads: np.ndarray       # (B, 4, 2) f32 — (padw, padh) canvas->src shift
    minv: np.ndarray       # (B, 3, 3) f32 — inverse perspective matrix
    persp: np.ndarray      # (B,) f32 — 1.0 when perspective division needed
    flips: np.ndarray      # (B, 2) f32 — (fliplr, flipud) 0/1
    hsv: np.ndarray        # (B, 3) f32 — (brightness, saturation, hue) gains
    mask_lut: np.ndarray   # (B, 4, 256) int32 — per-tile instance-id remap


def _area(b: np.ndarray) -> np.ndarray:
    return (np.clip(b[:, 2] - b[:, 0], 0, None)
            * np.clip(b[:, 3] - b[:, 1], 0, None))


def _mosaic_rects(xc: int, yc: int, shapes: Sequence, s: int):
    """The 4 tile placements of Augment.cs:158-199 / augment.py:mosaic4."""
    out = []
    for i, (h, w) in enumerate(shapes):
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:
            x1a, y1a = xc, max(yc - h, 0)
            x2a, y2a = min(xc + w, 2 * s), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:
            x1a, y1a = max(xc - w, 0), yc
            x2a, y2a = xc, min(2 * s, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a = xc, yc
            x2a, y2a = min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b = 0, 0
        out.append((x1a, y1a, x2a, y2a, x1a - x1b, y1a - y1b))
    return out


def _perspective_matrix(img_h: int, img_w: int, out_w: int, out_h: int,
                        cfg, rng) -> tuple:
    """The C/P/R/S/T chain of augment.py:random_perspective (same rng
    draw order so host and device paths are statistically identical)."""
    C = np.eye(3, dtype=np.float32)
    C[0, 2] = -img_w / 2
    C[1, 2] = -img_h / 2
    P = np.eye(3, dtype=np.float32)
    P[2, 0] = rng.uniform(-1, 1) * cfg.perspective
    P[2, 1] = rng.uniform(-1, 1) * cfg.perspective
    R = np.eye(3, dtype=np.float32)
    a = rng.uniform(-1, 1) * cfg.degrees
    sc = 1 + rng.uniform(-1, 1) * cfg.scale
    rad = math.radians(a)
    alpha, beta = math.cos(rad) * sc, math.sin(rad) * sc
    R[:2] = [[alpha, beta, 0], [-beta, alpha, 0]]
    S = np.eye(3, dtype=np.float32)
    S[0, 1] = math.tan(rng.uniform(-1, 1) * cfg.shear * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-1, 1) * cfg.shear * math.pi / 180)
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = (0.5 + rng.uniform(-1, 1) * cfg.translate) * out_w
    T[1, 2] = (0.5 + rng.uniform(-1, 1) * cfg.translate) * out_h
    return T @ S @ R @ P @ C, cfg.perspective > 0


def plan_mosaic_batch(records: List[LabelRecord], cfg, rng,
                      group: int = 0, extras_per_group: int = 0) -> tuple:
    """Host planning: random draws + exact label geometry for one batch.

    records: the batch's (already decoded+resized) records. group > 0
    keeps each sample's mosaic partners inside its own group of that size
    (data-parallel shards must not gather tiles across devices). Returns
    (MosaicPlan, labels) where labels is a list of per-sample label-only
    LabelRecords (img/mask set to None — pixels come from the device).

    extras_per_group > 0 enables DATASET-WIDE partner sampling (the
    reference's distribution, YoloDataset.cs:65): records must then be in
    per-group block layout — n_groups blocks of (group + extras) records,
    where each block's first `group` entries are the output samples and
    the rest are partner-only extras drawn from the whole dataset by the
    caller. Partners are drawn uniformly from the sample's full block.
    """
    E = extras_per_group
    s = cfg.image_size
    border = -s // 2
    out_w = out_h = s  # 2s + 2*border

    if E > 0:
        gs = group if group and group > 0 else len(records) - E
        block = gs + E
        assert len(records) % block == 0, (len(records), gs, E)
        b = (len(records) // block) * gs          # output samples
    else:
        b = len(records)
        gs = group if group and group > 0 else b

    src_idx = np.zeros((b, 4), np.int32)
    rects = np.zeros((b, 4, 4), np.float32)
    pads = np.zeros((b, 4, 2), np.float32)
    minv = np.zeros((b, 3, 3), np.float32)
    persp = np.zeros((b,), np.float32)
    flips = np.zeros((b, 2), np.float32)
    hsv = np.zeros((b, 3), np.float32)
    mask_lut = np.zeros((b, 4, 256), np.int32)
    labels: List[LabelRecord] = []

    for i in range(b):
        if E > 0:
            g, j = divmod(i, gs)
            base = g * (gs + E)
            mpos = base + j
            picks = base + rng.integers(0, gs + E, 3)
        else:
            mpos = i
            g0 = (i // gs) * gs
            picks = g0 + rng.integers(0, min(gs, len(records) - g0), 3)
        main = records[mpos]
        idx4 = np.array([mpos, *picks], np.int32)
        src_idx[i] = idx4
        yc = int(rng.integers(-border, 2 * s + border))
        xc = int(rng.integers(-border, 2 * s + border))
        tiles = [records[j] for j in idx4]
        placements = _mosaic_rects(xc, yc,
                                   [t.resized_shape for t in tiles], s)

        # ---- mosaic label pass (augment.py:mosaic4 labels)
        cls_l, box_l, kpt_l, cor_l = [], [], [], []
        tile_of, local_of = [], []   # per-gt provenance for the mask LUT
        for k, (rec, (x1a, y1a, x2a, y2a, padw, padh)) in enumerate(
                zip(tiles, placements)):
            rects[i, k] = (x1a, y1a, x2a, y2a)
            pads[i, k] = (padw, padh)
            n = 0 if rec.cls is None else len(rec.cls)
            if n == 0:
                continue
            cls_l.append(rec.cls)
            box_l.append(rec.bboxes + [padw, padh, padw, padh])
            if rec.keypoints is not None:
                kk = rec.keypoints.copy()
                kk[..., 0] += padw
                kk[..., 1] += padh
                kpt_l.append(kk)
            if rec.obb_corners is not None:
                cc = rec.obb_corners.copy()
                cc[..., 0] += padw
                cc[..., 1] += padh
                cor_l.append(cc)
            tile_of.extend([k] * n)
            local_of.extend(range(1, n + 1))

        cls = np.concatenate(cls_l) if cls_l else np.zeros(0, np.float32)
        boxes = (np.concatenate(box_l) if box_l
                 else np.zeros((0, 4), np.float32))
        org_areas = _area(boxes)
        boxes = np.clip(boxes, 0, 2 * s)
        good1 = (_area(boxes) > 0) & (_area(boxes) > 0.7 * org_areas)
        kpts = np.concatenate(kpt_l) if kpt_l else None
        cors = np.concatenate(cor_l) if cor_l else None
        tile_of = np.asarray(tile_of, np.int32)
        local_of = np.asarray(local_of, np.int32)

        cls, boxes = cls[good1], boxes[good1]
        kpts = kpts[good1] if kpts is not None else None
        cors = cors[good1] if cors is not None else None
        tile_of, local_of = tile_of[good1], local_of[good1]

        # ---- perspective (augment.py:random_perspective labels)
        M, has_p = _perspective_matrix(2 * s, 2 * s, out_w, out_h, cfg, rng)
        minv[i] = np.linalg.inv(M)
        persp[i] = float(has_p)
        n = len(cls)
        if n:
            corner_idx = [0, 1, 2, 3, 0, 3, 2, 1]
            pts = boxes[:, corner_idx].reshape(-1, 2)
            ones = np.ones((pts.shape[0], 1), np.float32)
            xy = np.concatenate([pts, ones], 1) @ M.T
            xy = (xy[:, :2] / xy[:, 2:3]) if has_p else xy[:, :2]
            xy = xy.reshape(n, 4, 2)
            nb = np.concatenate([xy.min(1), xy.max(1)], 1)
            nb[:, [0, 2]] = nb[:, [0, 2]].clip(0, out_w)
            nb[:, [1, 3]] = nb[:, [1, 3]].clip(0, out_h)
            good2 = _area(nb) > 0

            if kpts is not None:
                nk = kpts.shape[1]
                pts = kpts[..., :2].reshape(-1, 2)
                xy = np.concatenate(
                    [pts, np.ones((pts.shape[0], 1), np.float32)], 1) @ M.T
                xy = xy[:, :2] / xy[:, 2:3]
                vis = (kpts[..., 2].reshape(-1).copy()
                       if kpts.shape[-1] == 3 else np.ones(len(xy)))
                oob = ((xy[:, 0] < 0) | (xy[:, 1] < 0)
                       | (xy[:, 0] > out_w) | (xy[:, 1] > out_h))
                vis[oob] = 0
                kt = np.concatenate([xy, vis[:, None]], 1).reshape(n, nk, 3)
                kt[..., 0] = kt[..., 0].clip(0, out_w)
                kt[..., 1] = kt[..., 1].clip(0, out_h)
                kpts = kt[..., :kpts.shape[-1]]
            if cors is not None:
                c2 = cors.reshape(-1, 2)
                xy = np.concatenate(
                    [c2, np.ones((c2.shape[0], 1), np.float32)], 1) @ M.T
                xy = (xy[:, :2] / xy[:, 2:3]) if has_p else xy[:, :2]
                ct = xy.reshape(n, 4, 2)
                ct[..., 0] = ct[..., 0].clip(0, out_w)
                ct[..., 1] = ct[..., 1].clip(0, out_h)
                cors = ct

            cls, boxes = cls[good2], nb[good2]
            kpts = kpts[good2] if kpts is not None else None
            cors = cors[good2] if cors is not None else None
            tile_of, local_of = tile_of[good2], local_of[good2]

        # composed instance-id LUT: tile-local id -> final 1..n id
        for j, (tk, lk) in enumerate(zip(tile_of, local_of)):
            mask_lut[i, tk, lk] = j + 1

        # ---- flips + HSV draws (label flips mirror augment.py:flip_*)
        do_lr = cfg.flip_lr > 0 and rng.uniform() <= cfg.flip_lr
        do_ud = cfg.flip_ud > 0 and rng.uniform() <= cfg.flip_ud
        flips[i] = (float(do_lr), float(do_ud))
        if do_lr and len(boxes):
            x1 = out_w - boxes[:, 2].copy()
            x2 = out_w - boxes[:, 0].copy()
            boxes[:, 0], boxes[:, 2] = x1, x2
            if kpts is not None:
                kpts[..., 0] = out_w - kpts[..., 0]
            if cors is not None:
                cors[..., 0] = out_w - cors[..., 0]
        if do_ud and len(boxes):
            y1 = out_h - boxes[:, 3].copy()
            y2 = out_h - boxes[:, 1].copy()
            boxes[:, 1], boxes[:, 3] = y1, y2
            if kpts is not None:
                kpts[..., 1] = out_h - kpts[..., 1]
            if cors is not None:
                cors[..., 1] = out_h - cors[..., 1]
        hsv[i] = (rng.uniform(max(0, 1 - cfg.hsv_v), 1 + cfg.hsv_v),
                  rng.uniform(max(0, 1 - cfg.hsv_s), 1 + cfg.hsv_s),
                  rng.uniform(-cfg.hsv_h, cfg.hsv_h))

        lab = LabelRecord(im_file=main.im_file, img=None,
                          org_shape=main.org_shape,
                          resized_shape=(out_h, out_w),
                          mask_ratio=main.mask_ratio)
        lab.cls = cls
        lab.bboxes = boxes
        lab.keypoints = kpts
        lab.obb_corners = cors
        lab.mask = None       # device-sampled
        labels.append(lab)

    return MosaicPlan(src_idx, rects, pads, minv, persp, flips, hsv,
                      mask_lut), labels


# ---------------------------------------------------------------------------
# device side (pure jnp; jitted by the caller or fused into the train step)


def _rgb_to_hsv_cv(img):
    """cv2-convention HSV for [0,255] RGB: H in [0,180), S/V in [0,255]."""
    return _rgb_planes_to_hsv(img[..., 0], img[..., 1], img[..., 2])


def _rgb_planes_to_hsv(r, g, b):
    import jax.numpy as jnp

    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(mx == r, (g - b) / safe * 30.0,
                  jnp.where(mx == g, 60.0 + (b - r) / safe * 30.0,
                            120.0 + (r - g) / safe * 30.0))
    h = jnp.where(diff > 0, h % 180.0, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0) * 255.0, 0.0)
    return h, s, mx


def _hsv_to_rgb_cv(h, s, v):
    import jax.numpy as jnp

    return jnp.stack(_hsv_to_rgb_planes(h, s, v), -1)


def _hsv_to_rgb_planes(h, s, v):
    import jax.numpy as jnp

    h = (h % 180.0) / 30.0           # sector in [0, 6)
    i = jnp.floor(h)
    f = h - i
    s = s / 255.0
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return r, g, b


def apply_hsv(img, gains):
    """ColorJitter-style jitter (augment.py:random_hsv semantics) on a
    float [0,255] RGB image; gains = (brightness, saturation, hue)."""
    import jax.numpy as jnp

    h, s, v = _rgb_to_hsv_cv(img)
    v = jnp.clip(v * gains[0], 0, 255)
    s = jnp.clip(s * gains[1], 0, 255)
    h = (h + gains[2] * 180.0) % 180.0
    return jnp.clip(_hsv_to_rgb_cv(h, s, v), 0, 255)


def apply_hsv_planes(r, g, b, gains):
    """apply_hsv on channel-PLANAR (s, s) arrays (same math, full-width
    lanes — elementwise ops on 3-minor layouts use 3/128 VPU lanes)."""
    import jax.numpy as jnp

    h, s, v = _rgb_planes_to_hsv(r, g, b)
    v = jnp.clip(v * gains[0], 0, 255)
    s = jnp.clip(s * gains[1], 0, 255)
    h = (h + gains[2] * 180.0) % 180.0
    rr, gg, bb = _hsv_to_rgb_planes(h, s, v)
    return (jnp.clip(rr, 0, 255), jnp.clip(gg, 0, 255),
            jnp.clip(bb, 0, 255))


def _sample_one(pool_flat, page, sy, sx, s, fill, nearest):
    """Gather bilinear/nearest samples from pool_flat ((B*s*s, C))."""
    import jax.numpy as jnp

    def gather(iy, ix, ok):
        flat = (page * s + iy) * s + ix
        vals = jnp.take(pool_flat, flat, axis=0)      # (N, C)
        return jnp.where(ok[:, None], vals, fill)

    if nearest:
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        ok = (ix >= 0) & (ix < s) & (iy >= 0) & (iy < s)
        return gather(jnp.clip(iy, 0, s - 1), jnp.clip(ix, 0, s - 1), ok)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[:, None]
    wy = (sy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(iy, ix):
        ok = (ix >= 0) & (ix < s) & (iy >= 0) & (iy < s)
        return gather(jnp.clip(iy, 0, s - 1), jnp.clip(ix, 0, s - 1), ok)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _sep_axis_weights(q, lo, hi, pad, s_in):
    """1-D bilinear weight matrix for one tile of an AXIS-ALIGNED warp.

    q: (s_out,) canvas coordinates of the output pixels along this axis.
    Returns (s_out, s_in): rows whose canvas coord falls outside the
    tile's interval [lo, hi) are zero; rows inside hold the two bilinear
    corner weights of source coordinate q - pad. Out-of-range corners
    simply match no column — their weight mass is re-added as the 114
    border fill through the coverage remainder (exactly the gather path's
    `where(ok, v, 114)` semantics, since Σ corner weights == 1).
    """
    import jax.numpy as jnp

    mem = (q >= lo) & (q < hi)
    sx = q - pad
    x0 = jnp.floor(sx)
    wx = (sx - x0)[:, None]
    x0i = x0.astype(jnp.int32)[:, None]
    j = jnp.arange(s_in, dtype=jnp.int32)[None, :]
    w = (j == x0i) * (1.0 - wx) + (j == x0i + 1) * wx
    return w * mem[:, None]


def _render_separable(pool, plan_arrays, s: int, packed: bool):
    """Mosaic+scale+translate+flip+HSV render as dense MXU matmuls.

    Valid only for AXIS-ALIGNED warps (degrees == shear == perspective
    == 0 — the reference's default hyps, Data/Config.cs): the sampling
    coordinate then separates per axis (qx = m00·x + m02), so the whole
    bilinear gather becomes, per tile k,   Wy_k @ src_k @ Wx_kᵀ   with
    1-D interpolation matrices — MXU work instead of XLA's per-row
    gathers (measured ~9 ms/step of gather at v8n-320 b16; see
    ROUND_NOTES round-3). Tiles partition the canvas, so the 4 per-tile
    products sum exactly to the gather path's tile select, and the 114
    border/out-of-corner fill is the separable coverage remainder
    (1 - Σ_valid wy · Σ_valid wx). Bit-differences vs the gather path are
    only f32 summation order inside the bilinear lerp.
    """
    import jax
    import jax.numpy as jnp

    src_idx, rects, pads, minv, _persp, flips, hsv = plan_arrays
    poolp = pool.transpose(0, 3, 1, 2).astype(jnp.float32)  # (P, 3, s, s)
    x = jnp.arange(s, dtype=jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def per_image(src4, rect4, pad4, mi, fl, gains):
        px = jnp.where(fl[0] > 0, (s - 1.0) - x, x)
        py = jnp.where(fl[1] > 0, (s - 1.0) - x, x)
        qx = mi[0, 0] * px + mi[0, 2]
        qy = mi[1, 1] * py + mi[1, 2]
        wy = jnp.stack([_sep_axis_weights(qy, rect4[k, 1], rect4[k, 3],
                                          pad4[k, 1], s) for k in range(4)])
        wx = jnp.stack([_sep_axis_weights(qx, rect4[k, 0], rect4[k, 2],
                                          pad4[k, 0], s) for k in range(4)])
        pages = jnp.take(poolp, src4, axis=0)            # (4, 3, s, s)
        tmp = jnp.einsum("kij,kcjw->kciw", wy, pages, precision=hp)
        out4 = jnp.einsum("kciw,kxw->kcix", tmp, wx, precision=hp)
        planes = out4.sum(0)                             # (3, s, s)
        cov = jnp.einsum("ki,kx->ix", wy.sum(-1), wx.sum(-1), precision=hp)
        planes = planes + (1.0 - cov)[None] * 114.0
        r, g, b = apply_hsv_planes(planes[0], planes[1], planes[2], gains)
        img = jnp.stack([r, g, b], 0)
        if packed:
            img = img.reshape(3, s // 2, 2, s // 2, 2)
            return img.transpose(1, 3, 2, 4, 0).reshape(s // 2, s // 2, 12)
        return img.transpose(1, 2, 0)

    return jax.vmap(per_image)(src_idx, rects, pads, minv, flips, hsv)


def mosaic_perspective_images(pool, plan_arrays, imgsz: int,
                              packed: bool = False,
                              separable: bool = False):
    """(B, s, s, 3) uint8 source pool + plan -> (B, s, s, 3) float images.

    One fused program: flip -> M^-1 -> tile select -> bilinear gather ->
    HSV. Call under jax.jit (or let the train step fuse it).

    packed=True emits the canvas 2x2 space-to-depth packed instead:
    (B, s/2, s/2, 12) with channel index (py*2+px)*3 + c (the
    space_to_depth2 convention, nn/common.py). The packing costs NOTHING
    in-graph: the sampling coordinate grid (a compile-time constant) is
    enumerated in packed pixel order, so the gather writes the packed
    layout directly and the final reshape is contiguous — no transpose.
    Pairs with the stem's s2d_packed_input ConvBN rewrite for training.

    separable=True (host-gated: ONLY when degrees == shear == perspective
    == 0, the reference defaults) renders through dense per-tile
    interpolation matmuls instead of gathers — see _render_separable.
    """
    import jax
    import jax.numpy as jnp

    if separable:
        # _render_separable drops minv[:,0,1]/minv[:,1,0] and persp — a
        # non-axis-aligned warp would render silently wrong pixels. The
        # production caller gates on the hyps (tasks.py); defend direct
        # callers here whenever the plan is concrete (host arrays). Under
        # jit tracers the values are unseeable — the host gate stands.
        minv_a, persp_a = plan_arrays[3], plan_arrays[4]
        try:
            # concretize instead of isinstance(x, jax.core.Tracer): the
            # jax.core access path is deprecated and the conversion error
            # is the stable cross-version signal for "traced"
            m, pa = np.asarray(minv_a), np.asarray(persp_a)
        except jax.errors.TracerArrayConversionError:
            m = pa = None
        if m is not None:
            if (pa.any() or np.abs(m[:, 0, 1]).max() > 0
                    or np.abs(m[:, 1, 0]).max() > 0):
                raise ValueError(
                    "separable=True requires an axis-aligned warp "
                    "(degrees == shear == perspective == 0); this plan "
                    "has rotation/shear/perspective terms — render with "
                    "separable=False.")
        return _render_separable(pool, plan_arrays, imgsz, packed)

    s = imgsz
    src_idx, rects, pads, minv, persp, flips, hsv = plan_arrays
    b = pool.shape[0]
    pool_flat = pool.reshape(b * s * s, pool.shape[-1]).astype(jnp.float32)

    ys, xs = jnp.mgrid[0:s, 0:s]
    if packed:
        # enumerate canvas pixels in packed order: (h, w, py, px) row-major
        ys = ys.reshape(s // 2, 2, s // 2, 2).transpose(0, 2, 1, 3)
        xs = xs.reshape(s // 2, 2, s // 2, 2).transpose(0, 2, 1, 3)
    xs = xs.reshape(-1).astype(jnp.float32)
    ys = ys.reshape(-1).astype(jnp.float32)

    def per_image(src4, rect4, pad4, mi, pp, fl, gains):
        # flips compose into the sampling coordinate (array-index mirror)
        px = jnp.where(fl[0] > 0, (s - 1) - xs, xs)
        py = jnp.where(fl[1] > 0, (s - 1) - ys, ys)
        qx = mi[0, 0] * px + mi[0, 1] * py + mi[0, 2]
        qy = mi[1, 0] * px + mi[1, 1] * py + mi[1, 2]
        qz = mi[2, 0] * px + mi[2, 1] * py + mi[2, 2]
        z = jnp.where(pp > 0, qz, 1.0)
        qx = qx / z
        qy = qy / z

        # tile of each canvas point (rects partition the canvas)
        inr = [(qx >= rect4[k, 0]) & (qx < rect4[k, 2])
               & (qy >= rect4[k, 1]) & (qy < rect4[k, 3]) for k in range(4)]
        tile = jnp.select(inr, [jnp.full_like(qx, k, dtype=jnp.int32)
                                for k in range(4)], 4).astype(jnp.int32)
        any_t = tile < 4
        tile_c = jnp.clip(tile, 0, 3)
        page = jnp.take(src4, tile_c)
        sx = qx - jnp.take(pad4[:, 0], tile_c)
        sy = qy - jnp.take(pad4[:, 1], tile_c)
        vals = _sample_one(pool_flat, page, sy, sx, s, 114.0, nearest=False)
        img = jnp.where(any_t[:, None], vals, 114.0)
        if packed:
            img = apply_hsv(img.reshape(s // 2, s // 2, 4, 3), gains)
            return img.reshape(s // 2, s // 2, 12)
        return apply_hsv(img.reshape(s, s, 3), gains)

    return jax.vmap(per_image)(src_idx, rects, pads, minv, persp, flips,
                               hsv)


def mosaic_perspective_masks(mask_pool, plan_arrays, imgsz: int,
                             mask_ratio: int):
    """Overlap-id mask counterpart: nearest sampling + per-tile LUT remap.

    mask_pool: (B, s/r, s/r) uint8/int tile-local instance ids.
    """
    import jax
    import jax.numpy as jnp

    r = mask_ratio
    sm = imgsz // r
    src_idx, rects, pads, minv, persp, flips, lut = plan_arrays
    b = mask_pool.shape[0]
    pool_flat = mask_pool.reshape(b * sm * sm, 1).astype(jnp.int32)

    ys, xs = jnp.mgrid[0:sm, 0:sm]
    xs = xs.reshape(-1).astype(jnp.float32)
    ys = ys.reshape(-1).astype(jnp.float32)

    def per_image(src4, rect4, pad4, mi, pp, fl, lut_i):
        px = jnp.where(fl[0] > 0, (sm - 1) - xs, xs)
        py = jnp.where(fl[1] > 0, (sm - 1) - ys, ys)
        # full-res canvas coords of the mask grid point
        fx = px * r
        fy = py * r
        qx = mi[0, 0] * fx + mi[0, 1] * fy + mi[0, 2]
        qy = mi[1, 0] * fx + mi[1, 1] * fy + mi[1, 2]
        qz = mi[2, 0] * fx + mi[2, 1] * fy + mi[2, 2]
        z = jnp.where(pp > 0, qz, 1.0)
        qx = qx / z
        qy = qy / z
        inr = [(qx >= rect4[k, 0]) & (qx < rect4[k, 2])
               & (qy >= rect4[k, 1]) & (qy < rect4[k, 3]) for k in range(4)]
        tile = jnp.select(inr, [jnp.full_like(qx, k, dtype=jnp.int32)
                                for k in range(4)], 4).astype(jnp.int32)
        any_t = tile < 4
        tile_c = jnp.clip(tile, 0, 3)
        page = jnp.take(src4, tile_c)
        sx = (qx - jnp.take(pad4[:, 0], tile_c)) / r
        sy = (qy - jnp.take(pad4[:, 1], tile_c)) / r
        ids = _sample_one(pool_flat, page, sy, sx, sm, 0, nearest=True)
        ids = jnp.where(any_t[:, None], ids, 0)[:, 0]
        remapped = lut_i[tile_c, jnp.clip(ids, 0, 255)]
        return remapped.reshape(sm, sm).astype(jnp.float32)

    return jax.vmap(per_image)(src_idx, rects, pads, minv, persp, flips,
                               lut)
