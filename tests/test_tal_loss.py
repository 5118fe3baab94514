"""TAL assigner parity vs a torch oracle of the reference algorithm, plus
loss-function sanity and gradient tests.

The oracle re-implements Utils/Tal.cs:50-255 in dynamic-shape torch; our
padded branch-free jnp version must match it on random problems.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosharp_tpu.loss import assign, detection_loss, obb_loss, pose_loss, \
    segmentation_loss, classification_loss
from yolosharp_tpu.ops import make_anchors


def _torch_tal_oracle(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                      n_gts, topk=10, topk2=None, num_classes=80,
                      alpha=0.5, beta=6.0, strides=(8, 16, 32), eps=1e-9):
    """Dynamic-shape reference algorithm (per batch element lists)."""
    import torch

    def ciou(box1, box2, eps=1e-7):
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
        v = 4 / np.pi**2 * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
        with torch.no_grad():
            al = v / (v - iou + (1 + eps))
        return iou - (rho2 / c2 + v * al)

    topk2 = topk if topk2 is None else topk2
    B, A, NC = pd_scores.shape
    out_scores = np.zeros((B, A, num_classes), np.float32)
    out_fg = np.zeros((B, A), bool)
    out_gt_idx = np.zeros((B, A), np.int64)
    out_boxes = np.zeros((B, A, 4), np.float32)

    for bi in range(B):
        n = n_gts[bi]
        if n == 0:
            continue
        ps = torch.from_numpy(pd_scores[bi])         # (A, NC)
        pb = torch.from_numpy(pd_bboxes[bi])         # (A, 4)
        gl = torch.from_numpy(gt_labels[bi][:n])     # (n,)
        gb = torch.from_numpy(gt_bboxes[bi][:n])     # (n, 4)
        ap = torch.from_numpy(anc_points)

        # candidates in gts w/ tiny-gt inflation
        xywh = torch.cat([(gb[:, :2] + gb[:, 2:]) / 2, gb[:, 2:] - gb[:, :2]], 1)
        wh = xywh[:, 2:].clone()
        wh[wh < strides[0]] = float(strides[1])
        gbi = torch.cat([xywh[:, :2] - wh / 2, xywh[:, :2] + wh / 2], 1)
        lt = gbi[:, None, :2]
        rb = gbi[:, None, 2:]
        deltas = torch.cat([ap[None] - lt, rb - ap[None]], 2)
        mask_in = deltas.amin(2) > eps               # (n, A)

        scores_g = ps[:, gl.long()].T                # (n, A)
        scores_g = torch.where(mask_in, scores_g, torch.zeros(()))
        ov = ciou(gb[:, None, :].expand(n, A, 4).reshape(-1, 4),
                  pb[None].expand(n, A, 4).reshape(-1, 4)).reshape(n, A)
        ov = torch.where(mask_in, ov.clamp(0), torch.zeros(()))
        align = scores_g**alpha * ov**beta

        km = min(topk, A)
        topk_metrics, topk_idxs = torch.topk(align, km, dim=-1)
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
        if topk2 != topk:
            am2 = align * mask_pos
            idx2 = torch.topk(am2, min(topk2, A), dim=-1).indices
            sel = torch.zeros_like(mask_pos)
            sel.scatter_(1, idx2, 1.0)
            mask_pos = mask_pos * sel
            fgc = mask_pos.sum(0)

        tgt_idx = mask_pos.argmax(0)                 # (A,)
        fg = fgc > 0
        tl = gl.long()[tgt_idx].clamp(0)
        tb = gb[tgt_idx]
        ts = torch.nn.functional.one_hot(tl, num_classes).float()
        ts = ts * fg[:, None]

        align = align * mask_pos
        pos_align = align.amax(-1, keepdim=True)
        pos_ov = (ov * mask_pos).amax(-1, keepdim=True)
        norm = (align * pos_ov / (pos_align + eps)).amax(0)
        ts = ts * norm[:, None]

        out_scores[bi] = ts.numpy()
        out_fg[bi] = fg.numpy()
        out_gt_idx[bi] = tgt_idx.numpy()
        out_boxes[bi] = tb.numpy()
    return out_scores, out_fg, out_gt_idx, out_boxes


def _random_problem(rng, B=2, A=525, M=12, NC=20, imgsz=320.0):
    pd_scores = rng.uniform(0, 1, (B, A, NC)).astype(np.float32)
    anc, strides = make_anchors([(20, 20), (10, 10), (5, 5)], [16, 32, 64])
    anc_points = np.asarray(anc * strides)
    cxy = rng.uniform(30, imgsz - 30, (B, A, 2))
    wh = rng.uniform(8, 80, (B, A, 2))
    pd_bboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    n_gts = rng.integers(0, M + 1, size=(B,))
    gt_labels = rng.integers(0, NC, size=(B, M)).astype(np.int64)
    gxy = rng.uniform(40, imgsz - 40, (B, M, 2))
    gwh = rng.uniform(10, 100, (B, M, 2))
    gt_bboxes = np.concatenate([gxy - gwh / 2, gxy + gwh / 2], -1).astype(np.float32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        mask[b, :n_gts[b]] = True
    gt_bboxes[~mask] = 0.0
    return pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask, n_gts


@pytest.mark.parametrize("seed,topk2", [(0, None), (1, None), (2, 1), (3, 2)])
def test_assign_matches_torch_oracle(seed, topk2):
    pytest.importorskip("torch")
    rng = np.random.default_rng(seed)
    ps, pb, anc, gl, gb, mask, n_gts = _random_problem(rng)
    NC = ps.shape[-1]

    res = assign(jnp.asarray(ps), jnp.asarray(pb), jnp.asarray(anc),
                 jnp.asarray(gl.astype(np.int32)), jnp.asarray(gb),
                 jnp.asarray(mask), topk=10, topk2=topk2, num_classes=NC,
                 min_stride=16, stride_val=32)

    want_scores, want_fg, want_idx, want_boxes = _torch_tal_oracle(
        ps, pb, anc, gl, gb, n_gts, topk=10, topk2=topk2, num_classes=NC,
        strides=(16, 32, 64))

    got_fg = np.asarray(res.fg_mask)
    got_scores = np.asarray(res.target_scores)
    # fg may differ ONLY at zero-weight anchors (top-k ties among zero-align
    # candidates — they contribute nothing to any loss term)
    diff = got_fg != want_fg
    assert (got_scores.sum(-1)[diff] < 1e-6).all()
    assert (want_scores.sum(-1)[diff] < 1e-6).all()

    agree = got_fg & want_fg
    np.testing.assert_array_equal(np.asarray(res.target_gt_idx)[agree],
                                  want_idx[agree])
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.target_bboxes)[agree],
                               want_boxes[agree], rtol=1e-5, atol=1e-4)


def _fake_det_preds(rng, B=2, nc=8, reg_max=16, hw=64, seed=0):
    key = jax.random.PRNGKey(seed)
    shapes = [(hw // 8, hw // 8), (hw // 16, hw // 16), (hw // 32, hw // 32)]
    box, cls = [], []
    for i, (h, w) in enumerate(shapes):
        k1, k2, key = jax.random.split(key, 3)
        box.append(jax.random.normal(k1, (B, h, w, 4 * reg_max)) * 0.5)
        cls.append(jax.random.normal(k2, (B, h, w, nc)) * 0.5 - 2.0)
    return {"box": tuple(box), "cls": tuple(cls)}


def _fake_batch(rng, B=2, M=6, nc=8, with_angle=False):
    cls = rng.integers(0, nc, (B, M)).astype(np.int32)
    xy = rng.uniform(0.3, 0.7, (B, M, 2))
    wh = rng.uniform(0.1, 0.25, (B, M, 2))
    cols = [xy, wh]
    if with_angle:
        cols.append(rng.uniform(0, np.pi / 2, (B, M, 1)))
    bboxes = np.concatenate(cols, -1).astype(np.float32)
    mask = rng.uniform(size=(B, M)) > 0.3
    mask[:, 0] = True
    return {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(bboxes),
            "mask_gt": jnp.asarray(mask)}


def test_detection_loss_finite_and_grad():
    rng = np.random.default_rng(0)
    preds = _fake_det_preds(rng)
    batch = _fake_batch(rng)

    loss, items = detection_loss(preds, batch, nc=8)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert items.shape == (3,)

    def f(p):
        return detection_loss(p, batch, nc=8)[0]

    grads = jax.grad(f)(preds)
    gnorm = sum(float(jnp.abs(g).sum()) for g in
                jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_detection_loss_empty_targets():
    rng = np.random.default_rng(1)
    preds = _fake_det_preds(rng)
    batch = _fake_batch(rng)
    batch["mask_gt"] = jnp.zeros_like(batch["mask_gt"])
    loss, items = detection_loss(preds, batch, nc=8)
    assert np.isfinite(float(loss))
    # no positives: box/dfl are zero, cls pushes scores down
    assert float(items[0]) == 0.0 and float(items[2]) == 0.0
    assert float(items[1]) > 0


def test_obb_loss_runs():
    rng = np.random.default_rng(2)
    preds = _fake_det_preds(rng)
    key = jax.random.PRNGKey(5)
    preds["angle"] = tuple(
        (jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(key, i),
                                          b.shape[:3] + (1,))) - 0.25) * np.pi
        for i, b in enumerate(preds["box"]))
    batch = _fake_batch(rng, with_angle=True)
    loss, items = obb_loss(preds, batch, nc=8)
    assert np.isfinite(float(loss)) and items.shape == (4,)


def test_segmentation_loss_runs():
    rng = np.random.default_rng(3)
    B, M, nc = 2, 6, 8
    preds = _fake_det_preds(rng, B=B, nc=nc)
    key = jax.random.PRNGKey(7)
    preds["mask"] = tuple(
        jax.random.normal(jax.random.fold_in(key, i), b.shape[:3] + (32,))
        for i, b in enumerate(preds["box"]))
    preds["proto"] = jax.random.normal(key, (B, 16, 16, 32))
    batch = _fake_batch(rng, B=B, M=M, nc=nc)
    batch["masks"] = jnp.asarray(
        rng.integers(0, M + 1, (B, 16, 16)).astype(np.float32))
    loss, items = segmentation_loss(preds, batch, nc=nc, max_fg=64)
    assert np.isfinite(float(loss)) and items.shape == (5,)

    def f(p):
        return segmentation_loss(p, batch, nc=nc, max_fg=64)[0]

    grads = jax.grad(f)(preds)
    assert np.isfinite(float(jnp.abs(grads["proto"]).sum()))


def test_semseg_branch_vs_torch_oracle():
    """The optional semantic-seg BCE+Dice branch (Loss.cs:745-770,
    282-325): items[4] == 0 without inputs; with preds['semseg'] +
    batch['sem_masks'] present it matches a literal torch replication of
    BCEDiceLoss (incl. the smooth=1 ctor quirk at Loss.cs:301 and the
    overlap background zeroing)."""
    import torch

    from yolosharp_tpu.loss.losses import bce_dice_loss

    rng = np.random.default_rng(4)
    B, M, nc = 2, 6, 8
    preds = _fake_det_preds(rng, B=B, nc=nc)
    key = jax.random.PRNGKey(7)
    preds["mask"] = tuple(
        jax.random.normal(jax.random.fold_in(key, i), b.shape[:3] + (32,))
        for i, b in enumerate(preds["box"]))
    preds["proto"] = jax.random.normal(key, (B, 16, 16, 32))
    batch = _fake_batch(rng, B=B, M=M, nc=nc)
    batch["masks"] = jnp.asarray(
        rng.integers(0, M + 1, (B, 16, 16)).astype(np.float32))
    _, base_items = segmentation_loss(preds, batch, nc=nc, max_fg=64)
    assert float(base_items[4]) == 0.0

    # semseg logits at a different resolution than sem_masks (exercises
    # the BCEDice nearest-resize of the target)
    sem_logits = rng.normal(0, 1, (B, 8, 8, nc)).astype(np.float32)
    sem_ids = rng.integers(0, nc, (B, 16, 16))
    preds2 = dict(preds, semseg=jnp.asarray(sem_logits))
    batch2 = dict(batch, sem_masks=jnp.asarray(sem_ids))
    _, items = segmentation_loss(preds2, batch2, nc=nc, max_fg=64)
    assert float(items[4]) > 0

    # torch oracle (NCHW), literal Loss.cs semantics
    sem_t = torch.nn.functional.one_hot(
        torch.from_numpy(sem_ids).long(), nc).permute(0, 3, 1, 2).float()
    mask_zero = torch.from_numpy(np.asarray(batch["masks"])) == 0
    sem_t[mask_zero.unsqueeze(1).expand_as(sem_t)] = 0
    pred_t = torch.from_numpy(sem_logits).permute(0, 3, 1, 2)
    tgt = torch.nn.functional.interpolate(sem_t, (8, 8), mode="nearest")
    bce = torch.nn.functional.binary_cross_entropy_with_logits(pred_t, tgt)
    p = pred_t.sigmoid()
    inter = (p * tgt).sum(dim=(2, 3))
    union = p.sum(dim=(2, 3)) + tgt.sum(dim=(2, 3))
    dice = (2.0 * inter + 1.0) / (union + 1.0)
    oracle = 0.5 * float(bce) + 0.5 * float((1.0 - dice).mean(1).mean())

    ours = float(bce_dice_loss(
        jnp.asarray(sem_logits),
        jax.nn.one_hot(jnp.asarray(sem_ids), nc)
        * (batch["masks"] > 0)[..., None]))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)
    # and the in-loss value is oracle * hyp_box (gated on fg > 0)
    np.testing.assert_allclose(float(items[4]), oracle * 7.5,
                               rtol=1e-5, atol=1e-5)


def test_pose_loss_runs():
    rng = np.random.default_rng(4)
    B, M, K = 2, 6, 17
    preds = _fake_det_preds(rng, B=B, nc=1)
    key = jax.random.PRNGKey(9)
    preds["kpt"] = tuple(
        jax.random.normal(jax.random.fold_in(key, i), b.shape[:3] + (K * 3,))
        for i, b in enumerate(preds["box"]))
    batch = _fake_batch(rng, B=B, M=M, nc=1)
    kp = rng.uniform(0.2, 0.8, (B, M, K, 3)).astype(np.float32)
    kp[..., 2] = (rng.uniform(size=(B, M, K)) > 0.2).astype(np.float32)
    batch["keypoints"] = jnp.asarray(kp)
    loss, items = pose_loss(preds, batch, nc=1)
    assert np.isfinite(float(loss)) and items.shape == (5,)


def test_classification_loss():
    logits = jnp.asarray([[2.0, -1.0, 0.5], [0.0, 3.0, -2.0]])
    batch = {"cls": jnp.asarray([0, 1])}
    loss, items = classification_loss({"cls": logits}, batch)
    p = jax.nn.log_softmax(logits)
    want = -(float(p[0, 0]) + float(p[1, 1])) / 2
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_segmentation_loss_crowded_fg_uncapped():
    """Round-1 regression: >256 foreground anchors silently lost mask
    gradients. The default slot bound (tal_topk * max_labels) must equal a
    fully-uncapped computation on a crowded batch."""
    rng = np.random.default_rng(9)
    B, M, nc = 1, 40, 8          # up to 400 fg anchors with tal_topk=10
    preds = _fake_det_preds(rng, B=B, nc=nc, hw=160)  # A = 525
    key = jax.random.PRNGKey(11)
    preds["mask"] = tuple(
        jax.random.normal(jax.random.fold_in(key, i), b.shape[:3] + (32,))
        for i, b in enumerate(preds["box"]))
    preds["proto"] = jax.random.normal(key, (B, 40, 40, 32))
    batch = _fake_batch(rng, B=B, M=M, nc=nc)
    # non-overlapping 8x5 grid of gt boxes -> each claims ~tal_topk anchors
    cx = (np.arange(8) + 0.5) / 8
    cy = (np.arange(5) + 0.5) / 5
    gx, gy = np.meshgrid(cx, cy)
    boxes = np.stack([gx.ravel(), gy.ravel(),
                      np.full(40, 0.115), np.full(40, 0.19)], -1)
    batch["bboxes"] = jnp.asarray(boxes[None].astype(np.float32))
    batch["masks"] = jnp.asarray(
        rng.integers(0, M + 1, (B, 40, 40)).astype(np.float32))

    loss_def, items_def = segmentation_loss(preds, batch, nc=nc)
    a_total = sum(int(np.prod(b.shape[1:3])) for b in preds["box"])
    loss_all, items_all = segmentation_loss(preds, batch, nc=nc,
                                            max_fg=a_total)
    np.testing.assert_allclose(float(loss_def), float(loss_all), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(items_def), np.asarray(items_all),
                               rtol=1e-5)
    # the old 256 cap genuinely diverges on this batch (guards the guard)
    loss_256, _ = segmentation_loss(preds, batch, nc=nc, max_fg=256)
    assert abs(float(loss_256) - float(loss_all)) > 1e-6, \
        "crowded batch no longer exceeds 256 fg anchors; strengthen it" 
