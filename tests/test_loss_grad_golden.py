"""Gradient-parity goldens: jax.grad of every task loss vs torch autograd
of an independent oracle of the reference semantics (Utils/Loss.cs).

The forward values of the losses are already oracle-tested piecewise
(test_tal_loss.py); these tests guard the BACKWARD pass, which encodes
reference subtleties with no forward trace:
  - CIoU's alpha term computed under no_grad (Metrics.cs:166-170)
  - DFL's two-bin interpolated cross-entropy gradients (Loss.cs:94-120)
  - the assigner running fully detached (Tal.cs:52)
  - empty-target gradient hygiene: box/dfl contribute exactly zero
    gradient, cls still pushes scores down (Loss.cs:854-858)
  - OKS keypoint loss + kobj BCE (Loss.cs:977-1040)
  - the OBB aspect-weighted sin^2(2*dtheta) angle loss (Loss.cs:657-677)
  - E2E dual-head gain weighting (Loss.cs:1094-1295)

Each oracle consumes the SAME random head outputs as torch leaf tensors,
re-implements the reference's dynamic-shape loss (fancy indexing over fg
anchors, not our padded where-masks), and compares grads w.r.t. every
head feature map at <=2e-4 rel.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosharp_tpu.loss import (classification_loss, detection_loss,
                                e2e_wrap, obb_loss, pose_loss,
                                segmentation_loss)
from yolosharp_tpu.loss.losses import _det_core

from test_tal_loss import _fake_batch, _fake_det_preds, _torch_tal_oracle

torch = pytest.importorskip("torch")

NC, REG_MAX, HW, B, M = 8, 16, 64, 2, 6
STRIDES = (8, 16, 32)


# ------------------------------------------------------------ torch helpers
def _np_anchors(hw=HW, strides=STRIDES):
    """Anchor grid in grid units + per-anchor stride (independent numpy
    re-derivation of ops.anchors.make_anchors)."""
    pts, st = [], []
    for s in strides:
        h = w = hw // s
        sx = np.arange(w, dtype=np.float32) + 0.5
        sy = np.arange(h, dtype=np.float32) + 0.5
        yy, xx = np.meshgrid(sy, sx, indexing="ij")
        pts.append(np.stack([xx, yy], -1).reshape(-1, 2))
        st.append(np.full((h * w, 1), s, np.float32))
    return np.concatenate(pts), np.concatenate(st)


def _t_flatten(levels):
    """[(B,H,W,C)] -> (B, A, C), level order preserved."""
    b = levels[0].shape[0]
    return torch.cat([t.reshape(b, -1, t.shape[-1]) for t in levels], 1)


def _t_dfl_decode(pred_distri, reg_max=REG_MAX):
    shape = pred_distri.shape[:-1]
    x = pred_distri.reshape(*shape, 4, reg_max)
    proj = torch.arange(reg_max, dtype=torch.float32)
    return (torch.softmax(x, -1) * proj).sum(-1)


def _t_dist2bbox(dist, anc):
    lt, rb = dist[..., :2], dist[..., 2:]
    return torch.cat([anc - lt, anc + rb], -1)


def _t_bbox2dist(anc, bbox, reg_max):
    d = torch.cat([anc - bbox[..., :2], bbox[..., 2:] - anc], -1)
    return d.clamp(0, reg_max - 0.01)


def _t_ciou(box1, box2, eps=1e-7):
    """Elementwise CIoU of aligned xyxy boxes; alpha under no_grad
    (Metrics.cs:166-170). Mirrors ops.iou.bbox_iou(CIoU=True) incl. the
    height-only clamp."""
    b1_x1, b1_y1, b1_x2, b1_y2 = box1.unbind(-1)
    b2_x1, b2_y1, b2_x2, b2_y2 = box2.unbind(-1)
    w1, h1 = b1_x2 - b1_x1, (b1_y2 - b1_y1).clamp(eps)
    w2, h2 = b2_x2 - b2_x1, (b2_y2 - b2_y1).clamp(eps)
    inter = ((torch.min(b1_x2, b2_x2) - torch.max(b1_x1, b2_x1)).clamp(0)
             * (torch.min(b1_y2, b2_y2) - torch.max(b1_y1, b2_y1)).clamp(0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = torch.max(b1_x2, b2_x2) - torch.min(b1_x1, b2_x1)
    ch = torch.max(b1_y2, b2_y2) - torch.min(b1_y1, b2_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
            + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    v = 4 / math.pi**2 * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
    with torch.no_grad():
        alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def _t_dfl_loss(pred_dist_logits, target, reg_max=REG_MAX):
    """Two-bin interpolated CE (Loss.cs:94-120), dynamic-shape gather
    flavor (our jnp version uses one-hot masked reduces instead)."""
    target = target.clamp(0, reg_max - 1 - 0.01)
    tl = target.floor().long()
    tr = tl + 1
    wl = tr.float() - target
    wr = 1.0 - wl
    logp = torch.log_softmax(pred_dist_logits, -1)
    ce_l = -logp.gather(-1, tl.unsqueeze(-1)).squeeze(-1)
    ce_r = -logp.gather(-1, tr.clamp(max=reg_max - 1).unsqueeze(-1)).squeeze(-1)
    return (ce_l * wl + ce_r * wr).mean(-1)


def _t_probiou(obb1, obb2, eps=1e-7):
    """Elementwise probiou of aligned xywhr boxes (Metrics.cs:200-244)."""
    def cov(o):
        a = o[..., 2] ** 2 / 12.0
        b = o[..., 3] ** 2 / 12.0
        r = o[..., 4]
        c, s = torch.cos(r), torch.sin(r)
        return a * c**2 + b * s**2, a * s**2 + b * c**2, (a - b) * c * s

    x1, y1, x2, y2 = obb1[..., 0], obb1[..., 1], obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = cov(obb1)
    a2, b2, c2 = cov(obb2)
    den = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2
    t1 = (((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2)
          / (den + eps)) * 0.25
    t2 = (((c1 + c2) * (x2 - x1) * (y1 - y2)) / (den + eps)) * 0.5
    t3 = torch.log(den / (4 * torch.sqrt(
        (a1 * b1 - c1**2).clamp(0) * (a2 * b2 - c2**2).clamp(0)) + eps)
        + eps) * 0.5
    bd = (t1 + t2 + t3).clamp(eps, 100.0)
    return 1.0 - torch.sqrt(1.0 - torch.exp(-bd) + eps)


def _t_bce(logits, targets):
    return torch.nn.functional.binary_cross_entropy_with_logits(
        logits, targets, reduction="none")


# ----------------------------------------------------- shared det-loss core
def _batch_to_oracle(batch, imgsz=HW):
    """Normalized padded batch -> oracle-format px gt arrays + prefix n."""
    cls = np.asarray(batch["cls"], np.int64)
    xywh = np.asarray(batch["bboxes"], np.float32)[..., :4] * imgsz
    xyxy = np.concatenate([xywh[..., :2] - xywh[..., 2:] / 2,
                           xywh[..., :2] + xywh[..., 2:] / 2], -1)
    mask = np.asarray(batch["mask_gt"], bool)
    n = mask.sum(-1)
    # compact each image's valid gts to a prefix (the oracle iterates
    # prefixes; the jax loss is order-invariant over gt slots)
    cls_c = np.zeros_like(cls)
    xyxy_c = np.zeros_like(xyxy)
    for b in range(cls.shape[0]):
        cls_c[b, :n[b]] = cls[b, mask[b]]
        xyxy_c[b, :n[b]] = xyxy[b, mask[b]]
    return cls_c, xyxy_c, n


def _prefix_batch(batch):
    """Re-pack a _fake_batch so valid gts form a prefix (keeps the jax
    loss input equivalent to the oracle's compacted view)."""
    mask = np.asarray(batch["mask_gt"], bool)
    cls = np.asarray(batch["cls"])
    bb = np.asarray(batch["bboxes"])
    out_c, out_b, out_m = (np.zeros_like(cls), np.zeros_like(bb),
                           np.zeros_like(mask))
    for i in range(mask.shape[0]):
        n = mask[i].sum()
        out_c[i, :n] = cls[i, mask[i]]
        out_b[i, :n] = bb[i, mask[i]]
        out_m[i, :n] = True
    out = dict(batch)
    out.update(cls=jnp.asarray(out_c), bboxes=jnp.asarray(out_b),
               mask_gt=jnp.asarray(out_m))
    return out


def _torch_det_terms(t_box, t_cls, batch, nc=NC):
    """Reference detection loss terms from torch leaf level tensors.
    Returns (loss_box, loss_cls, loss_dfl, extras dict for seg/pose)."""
    anc_np, st_np = _np_anchors()
    anc = torch.from_numpy(anc_np)
    st = torch.from_numpy(st_np)

    pred_distri = _t_flatten(t_box)            # (B, A, 64)
    pred_scores = _t_flatten(t_cls)            # (B, A, nc)
    b, a, _ = pred_scores.shape
    pred_dist4 = _t_dfl_decode(pred_distri)
    pred_bboxes = _t_dist2bbox(pred_dist4, anc)

    cls_c, xyxy_c, n = _batch_to_oracle(batch)
    ts, fg, gt_idx, tb = _torch_tal_oracle(
        torch.sigmoid(pred_scores).detach().numpy(),
        (pred_bboxes * st).detach().numpy(), anc_np * st_np,
        cls_c, xyxy_c, n, topk=10, num_classes=nc, strides=STRIDES)
    ts = torch.from_numpy(ts)
    fg_t = torch.from_numpy(fg)
    tb = torch.from_numpy(tb)

    tss = ts.sum().clamp(min=1.0)
    loss_cls = _t_bce(pred_scores, ts).sum() / tss

    weight = ts.sum(-1) * fg_t.float()
    tgt_strided = tb / st
    iou = _t_ciou(pred_bboxes, tgt_strided)
    loss_box = ((1.0 - iou) * weight).sum() / tss

    target_ltrb = _t_bbox2dist(anc, tgt_strided, REG_MAX - 1)
    dfl = _t_dfl_loss(pred_distri.reshape(b, a, 4, REG_MAX), target_ltrb)
    loss_dfl = (dfl * weight).sum() / tss
    extras = {"fg": fg, "gt_idx": gt_idx, "tb": tb, "tss": tss,
              "anc": anc, "st": st, "ts": ts}
    return loss_box, loss_cls, loss_dfl, extras


def _assert_fg_agrees(preds, batch, fg_oracle, nc=NC, **kw):
    """The jax assigner may legitimately differ from the oracle only at
    zero-weight anchors; the seeds used here are chosen so the fg masks
    agree EXACTLY (making grads comparable)."""
    out = _det_core(preds, batch, nc=nc, **kw)
    np.testing.assert_array_equal(np.asarray(out.fg_mask), fg_oracle)


def _grads_close(jax_grads, torch_leaves, rtol=2e-4, atol=1e-6):
    for jg, tl in zip(jax_grads, torch_leaves):
        np.testing.assert_allclose(np.asarray(jg), tl.grad.numpy(),
                                   rtol=rtol, atol=atol)


# ------------------------------------------------------------------- tests
@pytest.mark.parametrize("seed", [0, 4])
def test_detection_grad_golden(seed):
    rng = np.random.default_rng(seed)
    preds = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=seed)
    batch = _prefix_batch(_fake_batch(rng, B=B, M=M, nc=NC))

    loss, _ = detection_loss(preds, batch, nc=NC)
    grads = jax.grad(lambda p: detection_loss(p, batch, nc=NC)[0])(preds)

    t_box = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["box"]]
    t_cls = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["cls"]]
    lb, lc, ld, ex = _torch_det_terms(t_box, t_cls, batch)
    _assert_fg_agrees(preds, batch, ex["fg"])
    t_loss = (lb * 7.5 + lc * 0.5 + ld * 1.5) * B
    t_loss.backward()

    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-5)
    _grads_close(grads["box"], t_box)
    _grads_close(grads["cls"], t_cls)


def test_detection_grad_empty_targets():
    """Zero-sum hygiene (Loss.cs:854-858): with no gts the box/dfl terms
    must contribute EXACTLY zero gradient to the box maps, while cls
    still pushes scores down — grads must match torch bit-for-bit-ish."""
    rng = np.random.default_rng(1)
    preds = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=1)
    batch = _fake_batch(rng, B=B, M=M, nc=NC)
    batch["mask_gt"] = jnp.zeros_like(batch["mask_gt"])

    grads = jax.grad(lambda p: detection_loss(p, batch, nc=NC)[0])(preds)
    for g in grads["box"]:
        assert float(jnp.abs(g).max()) == 0.0
    gnorm = sum(float(jnp.abs(g).sum()) for g in grads["cls"])
    assert np.isfinite(gnorm) and gnorm > 0

    t_box = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["box"]]
    t_cls = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["cls"]]
    lb, lc, ld, _ = _torch_det_terms(t_box, t_cls, batch)
    ((lb * 7.5 + lc * 0.5 + ld * 1.5) * B).backward()
    for t in t_box:
        assert float(t.grad.abs().max()) == 0.0
    _grads_close(grads["cls"], t_cls)


@pytest.mark.parametrize("seed", [2])
def test_segmentation_grad_golden(seed):
    rng = np.random.default_rng(seed)
    preds = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=seed)
    key = jax.random.PRNGKey(7)
    nm, mh = 32, 16
    preds["mask"] = tuple(
        jax.random.normal(jax.random.fold_in(key, i), x.shape[:3] + (nm,))
        for i, x in enumerate(preds["box"]))
    preds["proto"] = jax.random.normal(key, (B, mh, mh, nm))
    batch = _prefix_batch(_fake_batch(rng, B=B, M=M, nc=NC))
    batch["masks"] = jnp.asarray(
        rng.integers(0, M + 1, (B, mh, mh)).astype(np.float32))

    loss, _ = segmentation_loss(preds, batch, nc=NC)
    grads = jax.grad(lambda p: segmentation_loss(p, batch, nc=NC)[0])(preds)

    t_box = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["box"]]
    t_cls = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["cls"]]
    t_mask = [torch.tensor(np.asarray(x), requires_grad=True)
              for x in preds["mask"]]
    t_proto = torch.tensor(np.asarray(preds["proto"]), requires_grad=True)
    lb, lc, ld, ex = _torch_det_terms(t_box, t_cls, batch)
    _assert_fg_agrees(preds, batch, ex["fg"])

    # reference mask branch (Loss.cs:774-853): python loop over fg anchors
    pred_masks = _t_flatten(t_mask)                    # (B, A, nm)
    masks_gt = torch.from_numpy(np.asarray(batch["masks"]).copy())
    fg = torch.from_numpy(ex["fg"])
    total_fg = fg.float().sum().clamp(min=1.0)
    loss_seg = torch.zeros(())
    for bi in range(B):
        idxs = torch.nonzero(fg[bi]).squeeze(-1)
        if not len(idxs):
            continue
        coeff = pred_masks[bi, idxs]                   # (F, nm)
        gti = torch.from_numpy(ex["gt_idx"][bi])[idxs]
        boxes_n = ex["tb"][bi, idxs] / HW              # normalized xyxy
        marea = ((boxes_n[:, 2] - boxes_n[:, 0])
                 * (boxes_n[:, 3] - boxes_n[:, 1]))
        mxyxy = boxes_n * mh
        pm = torch.einsum("fc,hwc->fhw", coeff, t_proto[bi])
        gt = (masks_gt[bi][None] == (gti[:, None, None] + 1).float()).float()
        l = _t_bce(pm, gt)
        r = torch.arange(mh, dtype=torch.float32)
        inside = ((r[None, None, :] >= mxyxy[:, 0, None, None])
                  & (r[None, None, :] < mxyxy[:, 2, None, None])
                  & (r[None, :, None] >= mxyxy[:, 1, None, None])
                  & (r[None, :, None] < mxyxy[:, 3, None, None]))
        l = (l * inside).mean((1, 2)) / marea.clamp(min=1e-7)
        loss_seg = loss_seg + l.sum()
    loss_seg = loss_seg / total_fg

    t_loss = (lb * 7.5 + loss_seg * 7.5 + lc * 0.5 + ld * 1.5) * B
    t_loss.backward()

    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-5)
    _grads_close(grads["box"], t_box)
    _grads_close(grads["cls"], t_cls)
    _grads_close(grads["mask"], t_mask)
    np.testing.assert_allclose(np.asarray(grads["proto"]),
                               t_proto.grad.numpy(), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("seed", [3])
def test_pose_grad_golden(seed):
    K, KD = 4, 3
    rng = np.random.default_rng(seed)
    preds = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=seed)
    key = jax.random.PRNGKey(11)
    preds["kpt"] = tuple(
        jax.random.normal(jax.random.fold_in(key, i),
                          x.shape[:3] + (K * KD,)) * 0.5
        for i, x in enumerate(preds["box"]))
    batch = _prefix_batch(_fake_batch(rng, B=B, M=M, nc=NC))
    kpts = rng.uniform(0.1, 0.9, (B, M, K, KD)).astype(np.float32)
    kpts[..., 2] = (rng.uniform(size=(B, M, K)) > 0.25).astype(np.float32)
    batch["keypoints"] = jnp.asarray(kpts)

    kw = dict(nc=NC, kpt_num=K, kpt_dim=KD)
    loss, _ = pose_loss(preds, batch, **kw)
    grads = jax.grad(lambda p: pose_loss(p, batch, **kw)[0])(preds)

    t_box = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["box"]]
    t_cls = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["cls"]]
    t_kpt = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["kpt"]]
    lb, lc, ld, ex = _torch_det_terms(t_box, t_cls, batch)
    # pose's fg enters loss_pose unweighted -> exact fg agreement required
    _assert_fg_agrees(preds, batch, ex["fg"], tal_topk2=10)

    # kpts_decode + OKS loss (Loss.cs:977-1040)
    a = ex["anc"].shape[0]
    pk = _t_flatten(t_kpt).reshape(B, a, K, KD)
    xy = pk[..., :2] * 2.0 + (ex["anc"][None, :, None, :] - 0.5)
    pk = torch.cat([xy, pk[..., 2:]], -1)
    gt_k = torch.from_numpy(kpts.copy())
    gt_k = torch.cat([gt_k[..., :2] * HW, gt_k[..., 2:]], -1)
    # compact to prefix like the oracle batch
    _, _, n = _batch_to_oracle(batch)
    fg = torch.from_numpy(ex["fg"])
    gti = torch.from_numpy(ex["gt_idx"])
    st = ex["st"]
    sel = torch.stack([gt_k[bi, gti[bi]] for bi in range(B)])  # (B,A,K,KD)
    sel = torch.cat([sel[..., :2] / st[None, :, :1, None].squeeze(-1)
                     .unsqueeze(-1), sel[..., 2:]], -1)
    tgt_strided = ex["tb"] / st
    area = ((tgt_strided[..., 2] - tgt_strided[..., 0])
            * (tgt_strided[..., 3] - tgt_strided[..., 1]))
    kpt_mask = (sel[..., 2] != 0).float()
    d = ((pk[..., 0] - sel[..., 0]) ** 2 + (pk[..., 1] - sel[..., 1]) ** 2)
    sigmas = torch.ones(K) / K
    e = d / ((2 * sigmas) ** 2 * (area[..., None] + 1e-9) * 2)
    factor = K / (kpt_mask.sum(-1) + 1e-6)
    per_anchor = (factor[..., None] * (1 - torch.exp(-e)) * kpt_mask).mean(-1)
    n_fg = fg.float().sum().clamp(min=1.0)
    loss_pose = (per_anchor * fg.float()).sum() / n_fg
    kobj = _t_bce(pk[..., 2], kpt_mask).mean(-1)
    loss_kobj = (kobj * fg.float()).sum() / n_fg

    t_loss = (lb * 7.5 + loss_pose * 12.0 + loss_kobj * 1.0
              + lc * 0.5 + ld * 1.5) * B
    t_loss.backward()

    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-5)
    _grads_close(grads["box"], t_box)
    _grads_close(grads["cls"], t_cls)
    _grads_close(grads["kpt"], t_kpt)


# --------------------------------------------------------------------- OBB
def _torch_tal_rotated(pd_scores, pd_bboxes, anc_points, gt_labels,
                       gt_bboxes, gt_mask, topk=10, num_classes=NC,
                       alpha=0.5, beta=6.0, min_stride=8, stride_val=16,
                       eps=1e-9):
    """Rotated TAL oracle (Tal.cs RotatedTaskAlignedAssigner:256-310):
    point-in-rotated-rect candidates + probiou overlaps; gt_bboxes xywhr
    in px. gt_mask is a per-slot validity mask (post tiny-filter)."""
    Bn, A, NCl = pd_scores.shape
    out_scores = np.zeros((Bn, A, num_classes), np.float32)
    out_fg = np.zeros((Bn, A), bool)
    out_gt_idx = np.zeros((Bn, A), np.int64)
    out_boxes = np.zeros((Bn, A, 5), np.float32)
    ap = torch.from_numpy(anc_points.astype(np.float32))

    for bi in range(Bn):
        keep = np.nonzero(gt_mask[bi])[0]
        n = len(keep)
        if n == 0:
            continue
        ps = torch.from_numpy(pd_scores[bi])
        pb = torch.from_numpy(pd_bboxes[bi])          # (A, 5) px xywhr
        gl = torch.from_numpy(gt_labels[bi][keep].astype(np.int64))
        gb = torch.from_numpy(gt_bboxes[bi][keep])    # (n, 5)

        wh = gb[:, 2:4].clone()
        small = wh < min_stride
        wh[small] = float(stride_val)
        ctr, r = gb[:, :2], gb[:, 4:5]
        cos, sin = torch.cos(r), torch.sin(r)
        v1 = torch.cat([wh[:, :1] / 2 * cos, wh[:, :1] / 2 * sin], -1)
        v2 = torch.cat([-wh[:, 1:] / 2 * sin, wh[:, 1:] / 2 * cos], -1)
        ca, cb, cd = ctr + v1 + v2, ctr + v1 - v2, ctr - v1 + v2
        ab, ad = cb - ca, cd - ca
        apv = ap[None] - ca[:, None]                  # (n, A, 2)
        ab_n = (ab * ab).sum(-1, keepdim=True)
        ad_n = (ad * ad).sum(-1, keepdim=True)
        p_ab = (apv * ab[:, None]).sum(-1)
        p_ad = (apv * ad[:, None]).sum(-1)
        mask_in = ((p_ab >= 0) & (p_ab <= ab_n) & (p_ad >= 0)
                   & (p_ad <= ad_n))

        scores_g = ps[:, gl].T
        scores_g = torch.where(mask_in, scores_g, torch.zeros(()))
        ov = _t_probiou(gb[:, None].expand(n, A, 5),
                        pb[None].expand(n, A, 5))
        ov = torch.where(mask_in, ov.clamp(0), torch.zeros(()))
        align = scores_g**alpha * ov**beta

        km = min(topk, A)
        _, topk_idxs = torch.topk(align, km, dim=-1)
        count = torch.zeros_like(align, dtype=torch.int64)
        for k in range(km):
            count.scatter_add_(1, topk_idxs[:, k:k + 1],
                               torch.ones_like(topk_idxs[:, k:k + 1]))
        count[count > 1] = 0
        mask_pos = count.float() * mask_in.float()

        fgc = mask_pos.sum(0)
        if fgc.max() > 1:
            multi = (fgc[None] > 1).expand(n, A)
            is_max = torch.zeros_like(mask_pos)
            is_max.scatter_(0, ov.argmax(0, keepdim=True), 1.0)
            mask_pos = torch.where(multi, is_max, mask_pos)
            fgc = mask_pos.sum(0)

        tgt_idx = mask_pos.argmax(0)
        fgm = fgc > 0
        tl = gl[tgt_idx].clamp(0)
        tsc = torch.nn.functional.one_hot(tl, num_classes).float()
        tsc = tsc * fgm[:, None]
        align = align * mask_pos
        pos_align = align.amax(-1, keepdim=True)
        pos_ov = (ov * mask_pos).amax(-1, keepdim=True)
        norm = (align * pos_ov / (pos_align + eps)).amax(0)
        tsc = tsc * norm[:, None]

        out_scores[bi] = tsc.numpy()
        out_fg[bi] = fgm.numpy()
        # map compacted idx back to the original slot (jax uses raw slots;
        # only gathered VALUES are compared so the mapping suffices)
        out_gt_idx[bi] = keep[tgt_idx.numpy()]
        out_boxes[bi] = gb[tgt_idx].numpy()
    return out_scores, out_fg, out_gt_idx, out_boxes


@pytest.mark.parametrize("seed", [5])
def test_obb_grad_golden(seed):
    rng = np.random.default_rng(seed)
    preds = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=seed)
    key = jax.random.PRNGKey(5)
    preds["angle"] = tuple(
        (jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(key, i),
                                          x.shape[:3] + (1,))) - 0.25)
        * math.pi
        for i, x in enumerate(preds["box"]))
    batch = _prefix_batch(_fake_batch(rng, B=B, M=M, nc=NC, with_angle=True))

    loss, _ = obb_loss(preds, batch, nc=NC)
    grads = jax.grad(lambda p: obb_loss(p, batch, nc=NC)[0])(preds)

    t_box = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["box"]]
    t_cls = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["cls"]]
    t_ang = [torch.tensor(np.asarray(x), requires_grad=True)
             for x in preds["angle"]]

    anc_np, st_np = _np_anchors()
    anc = torch.from_numpy(anc_np)
    st = torch.from_numpy(st_np)
    pred_distri = _t_flatten(t_box)
    pred_scores = _t_flatten(t_cls)
    pred_angle = _t_flatten(t_ang)                    # (B, A, 1)
    b, a, _ = pred_scores.shape

    # dist2rbox (Tal.cs:398-426)
    pred_dist4 = _t_dfl_decode(pred_distri)
    lt, rb = pred_dist4[..., :2], pred_dist4[..., 2:]
    cos, sin = torch.cos(pred_angle), torch.sin(pred_angle)
    xf, yf = ((rb - lt) / 2).split(1, -1)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    rbox = torch.cat([torch.cat([x, y], -1) + anc, lt + rb], -1)
    pred_bboxes = torch.cat([rbox, pred_angle], -1)   # (B, A, 5) grid units

    gt_xywh = np.asarray(batch["bboxes"], np.float32)
    gt_px = np.concatenate([gt_xywh[..., :4] * HW, gt_xywh[..., 4:5]], -1)
    gt_mask = (np.asarray(batch["mask_gt"], bool)
               & (gt_px[..., 2] >= 2) & (gt_px[..., 3] >= 2))
    assigner_boxes = torch.cat(
        [pred_bboxes[..., :4] * st, pred_bboxes[..., 4:5]], -1)
    ts, fg, _, tb = _torch_tal_rotated(
        torch.sigmoid(pred_scores).detach().numpy(),
        assigner_boxes.detach().numpy(), anc_np * st_np,
        np.asarray(batch["cls"]), gt_px, gt_mask)
    ts = torch.from_numpy(ts)
    fg_t = torch.from_numpy(fg).float()
    tb = torch.from_numpy(tb)

    tss = ts.sum().clamp(min=1.0)
    loss_cls = _t_bce(pred_scores, ts).sum() / tss
    weight = ts.sum(-1) * fg_t
    tgt = torch.cat([tb[..., :4] / st, tb[..., 4:5]], -1)
    iou = _t_probiou(pred_bboxes, tgt)
    loss_box = ((1.0 - iou) * weight).sum() / tss

    # rbox2dist (Tal.cs:428-453)
    off = tgt[..., :2] - anc
    tcos, tsin = torch.cos(tgt[..., 4:5]), torch.sin(tgt[..., 4:5])
    ox, oy = off.split(1, -1)
    xf2 = ox * tcos + oy * tsin
    yf2 = -ox * tsin + oy * tcos
    w2, h2 = tgt[..., 2:3], tgt[..., 3:4]
    tltrb = torch.cat([w2 / 2 - xf2, h2 / 2 - yf2, w2 / 2 + xf2,
                       h2 / 2 + yf2], -1).clamp(0, REG_MAX - 1 - 0.01)
    dfl = _t_dfl_loss(pred_distri.reshape(b, a, 4, REG_MAX), tltrb)
    loss_dfl = (dfl * weight).sum() / tss

    # angle loss (Loss.cs:657-677)
    log_ar = torch.log((tgt[..., 2] + 1e-9) / (tgt[..., 3] + 1e-9))
    scale_w = torch.exp(-(log_ar ** 2) / 9.0)
    dtheta = pred_bboxes[..., 4] - tgt[..., 4]
    dtheta = dtheta - torch.round(dtheta / math.pi) * math.pi
    loss_angle = (torch.sin(2 * dtheta) ** 2 * scale_w
                  * weight).sum() / tss

    t_loss = (loss_box * 7.5 + loss_cls * 0.5 + loss_dfl * 1.5
              + loss_angle * 1.0) * B
    t_loss.backward()

    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-5)
    _grads_close(grads["box"], t_box)
    _grads_close(grads["cls"], t_cls)
    _grads_close(grads["angle"], t_ang)


# ------------------------------------------------------ classification/E2E
def test_classification_grad_golden():
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(B * 3, NC)).astype(np.float32)
    labels = rng.integers(0, NC, (B * 3,)).astype(np.int32)
    preds = {"cls": jnp.asarray(logits)}
    batch = {"cls": jnp.asarray(labels)}
    loss, _ = classification_loss(preds, batch)
    g = jax.grad(lambda p: classification_loss(p, batch)[0])(preds)

    t = torch.tensor(logits, requires_grad=True)
    t_loss = torch.nn.functional.cross_entropy(t, torch.tensor(
        labels.astype(np.int64)))
    t_loss.backward()
    np.testing.assert_allclose(float(loss), float(t_loss.detach()), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g["cls"]), t.grad.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_e2e_grad_gain_weighting():
    """E2E dual loss grads must equal the gain-weighted sum of per-head
    grads and never leak gradient across heads (Loss.cs:1094-1295;
    Head.cs:92-101 detaches one2one feats at the head, so the loss itself
    must keep the two branches independent)."""
    rng = np.random.default_rng(6)
    p_m = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=6)
    p_o = _fake_det_preds(rng, B=B, nc=NC, hw=HW, seed=7)
    batch = _prefix_batch(_fake_batch(rng, B=B, M=M, nc=NC))
    import functools
    det = functools.partial(detection_loss, nc=NC)
    fn = e2e_wrap(det, det)
    o2m, o2o = 0.7, 0.3

    preds = {"one2many": p_m, "one2one": p_o}
    grads = jax.grad(
        lambda p: fn(p, batch, o2m_gain=o2m, o2o_gain=o2o)[0])(preds)
    g_m = jax.grad(lambda p: detection_loss(p, batch, nc=NC)[0])(p_m)
    g_o = jax.grad(lambda p: detection_loss(p, batch, nc=NC)[0])(p_o)

    for k in ("box", "cls"):
        for ga, gb_ in zip(grads["one2many"][k], g_m[k]):
            np.testing.assert_allclose(np.asarray(ga),
                                       np.asarray(gb_) * o2m,
                                       rtol=1e-6, atol=1e-10)
        for ga, gb_ in zip(grads["one2one"][k], g_o[k]):
            np.testing.assert_allclose(np.asarray(ga),
                                       np.asarray(gb_) * o2o,
                                       rtol=1e-6, atol=1e-10)
