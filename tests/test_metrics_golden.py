"""Golden tests for the val-metrics chain vs torch oracles of the reference.

Oracles replicate, literally:
 - match_predictions incl. GetUniqueMatches/GetUniqueByColumn greedy
   semantics (Models/YoloBaseTaskModel.cs:377-446) — note the reference's
   unique-by-column REORDERS rows to unique-value order, so the gt dedup
   keeps the lowest-index (highest-confidence) prediction per gt, not the
   highest-IoU one;
 - ap_per_class / compute_ap / interp / smooth (Utils/Metrics.cs:308-486),
   including interp's left-fill-at-x==xp[0] boundary and smooth's
   truncated filter width.

Driven with randomized dense prediction sets (multi-class overlaps) and
duplicate-IoU ties; asserts identical TP matrices and matching
P/R/mAP50/mAP50-95.
"""

import numpy as np
import torch

from yolosharp_tpu.utils import metrics as M


# --------------------------------------------------------------------- oracle
def _unique_by_column(matches: torch.Tensor, col: int) -> torch.Tensor:
    """GetUniqueByColumn (YoloBaseTaskModel.cs:423-445), per-element loop."""
    vals = matches[..., col]
    uniq, inv = vals.unique(return_inverse=True)
    first = torch.full((uniq.shape[0],), -1, dtype=torch.long)
    for i in range(vals.shape[0]):
        if first[inv[i]] == -1:
            first[inv[i]] = i
    return matches.index_select(0, first)


def oracle_match_predictions(pred_classes, true_classes, iou):
    """YoloBaseTaskModel.match_predictions (377-446)."""
    iouv = torch.linspace(0.5, 0.95, 10)
    correct = torch.zeros((pred_classes.shape[0], 10), dtype=torch.bool)
    correct_class = true_classes[..., None] == pred_classes
    iou = iou * correct_class
    for i in range(10):
        threshold = float(iouv[i])
        matches = torch.nonzero(iou >= threshold)
        if matches.shape[0] > 0:
            if matches.shape[0] > 1:
                order = iou[matches[..., 0], matches[..., 1]].argsort(
                    descending=True)
                matches = matches[order]
                matches = _unique_by_column(matches, 1)
                matches = _unique_by_column(matches, 0)
            correct[matches[..., 1], i] = True
    return correct


def oracle_interp(x, xp, fp, left=0.0):
    """Metrics.interp (425-470): right mask then left mask (left wins).

    One deliberate pin: the C# calls torch.argsort with libtorch's default
    UNSTABLE sort; on arrays with duplicates (recall plateaus in
    compute_ap) libtorch scrambles equal keys (measured: argsort of an
    already-sorted 24-elem float32 array returned [1,2,3,4,5,0,...]),
    which leaks the precision sentinel INTO the plateau and makes the
    interpolated AP depend on libtorch's sort internals. That behavior is
    semantically arbitrary, so the oracle uses stable=True — the
    interpretation Ultralytics' np.interp implements and the one the
    production code (utils/metrics.py interp) follows.
    """
    indices = torch.argsort(xp, stable=True)
    xs = xp.index_select(0, indices).contiguous()
    fs = fp.index_select(0, indices).contiguous()
    result = torch.empty_like(x)
    result[x >= xs[-1]] = fs[-1]
    result[x <= xs[0]] = left
    interior = (x > xs[0]) & (x < xs[-1])
    if int(interior.sum()) > 0:
        xi = x[interior]
        idx = torch.clamp(torch.searchsorted(xs, xi) - 1, 0, xs.size(0) - 2)
        x0, x1 = xs.gather(0, idx), xs.gather(0, idx + 1)
        y0, y1 = fs.gather(0, idx), fs.gather(0, idx + 1)
        result[interior] = y0 + (xi - x0) / (x1 - x0) * (y1 - y0)
    return result


def oracle_smooth(y, f=0.05):
    """Metrics.smooth (475-486): truncated nf, ones padding, conv1d."""
    nf = int(y.shape[0] * f * 2) // 2 * 2 + 1
    p = torch.ones(nf // 2) * y[0]
    yp = torch.cat([p, y, p])
    kernel = torch.ones(nf) / nf
    return torch.nn.functional.conv1d(
        yp.view(1, 1, -1), kernel.view(1, 1, -1)).flatten()


def oracle_compute_ap(recall, precision):
    """Metrics.compute_ap (396-422)."""
    mrec = torch.cat([torch.tensor([0.0]), recall, torch.tensor([1.0])])
    mpre = torch.cat([torch.tensor([1.0]), precision, torch.tensor([0.0])])
    mpre = mpre.flip(0).cummax(0).values.flip(0)
    x = torch.linspace(0, 1, 101)
    ap = float(torch.trapezoid(oracle_interp(x, mrec, mpre), x))
    return ap, mpre, mrec


def oracle_ap_per_class(tp, conf, pred_cls, target_cls, eps=1e-16):
    """Metrics.ap_per_class (308-384)."""
    ii = torch.argsort(-conf)
    tp, conf, pred_cls = tp[ii], conf[ii], pred_cls[ii]
    unique_classes, nt = torch.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]
    x = torch.linspace(0, 1, 1000)
    ap = torch.zeros((nc, tp.shape[1]))
    p_curve = torch.zeros((nc, 1000))
    r_curve = torch.zeros((nc, 1000))
    for ci in range(nc):
        i = pred_cls == unique_classes[ci]
        n_l, n_p = int(nt[ci]), int(i.sum())
        if n_p == 0 or n_l == 0:
            continue
        fpc = (~tp[i]).cumsum(0).float()
        tpc = tp[i].cumsum(0).float()
        recall = tpc / (n_l + eps)
        r_curve[ci] = oracle_interp(-x, -conf[i], recall[..., 0], left=0)
        precision = tpc / (tpc + fpc)
        p_curve[ci] = oracle_interp(-x, -conf[i], precision[..., 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j] = oracle_compute_ap(recall[..., j],
                                          precision[..., j])[0]
    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    imax = int(oracle_smooth(f1_curve.mean(0), 0.1).argmax())
    p, r, f1 = p_curve[:, imax], r_curve[:, imax], f1_curve[:, imax]
    tp_n = (r * nt).round()
    fp_n = (tp_n / (p + eps) - tp_n).round()
    return dict(tp=tp_n, fp=fp_n, p=p, r=r, f1=f1, ap=ap,
                unique_classes=unique_classes.int())


# ---------------------------------------------------------------- generators
def _random_scene(rng, n_gt, n_pred, n_cls):
    """Dense random matching scene: continuous IoUs (no accidental ties)."""
    tc = rng.integers(0, n_cls, n_gt)
    pc = rng.integers(0, n_cls, n_pred)
    iou = rng.uniform(0, 1, (n_gt, n_pred)) ** 0.5  # skew toward high IoU
    return (pc.astype(np.int64), tc.astype(np.int64),
            iou.astype(np.float32))


# -------------------------------------------------------------------- tests
def test_match_predictions_vs_oracle_randomized():
    rng = np.random.default_rng(0)
    for trial in range(30):
        n_gt = int(rng.integers(0, 12))
        n_pred = int(rng.integers(0, 40))
        pc, tc, iou = _random_scene(rng, n_gt, n_pred, n_cls=4)
        ours = M.match_predictions(pc, tc, iou)
        ref = oracle_match_predictions(
            torch.from_numpy(pc), torch.from_numpy(tc),
            torch.from_numpy(iou)).numpy()
        np.testing.assert_array_equal(ours, ref, err_msg=f"trial {trial}")


def test_match_predictions_gt_dedup_keeps_lowest_pred_index():
    """One gt matched by two preds: the reference keeps the LOWER-index
    pred even when the higher-index pred has better IoU (consequence of
    GetUniqueByColumn's reorder; Ultralytics semantics)."""
    pc = np.zeros(2, np.int64)
    tc = np.zeros(1, np.int64)
    iou = np.array([[0.6, 0.9]], np.float32)  # pred 1 has the better IoU
    ours = M.match_predictions(pc, tc, iou)
    ref = oracle_match_predictions(
        torch.from_numpy(pc), torch.from_numpy(tc),
        torch.from_numpy(iou)).numpy()
    np.testing.assert_array_equal(ours, ref)
    # explicit: at thresholds <= 0.6 pred 0 wins; above, pred 1
    assert ours[0, 0] and not ours[1, 0]        # thr 0.5
    assert not ours[0, 3] and ours[1, 3]        # thr 0.65


def test_match_predictions_duplicate_iou_ties():
    """Duplicate IoU values across disjoint (gt, pred) pairs — exercises
    the tie path of the argsort with an order-invariant outcome."""
    pc = np.array([0, 0, 1, 1], np.int64)
    tc = np.array([0, 0, 1], np.int64)
    iou = np.array([
        [0.8, 0.55, 0.0, 0.0],
        [0.55, 0.8, 0.0, 0.0],   # 0.8/0.55 duplicated, disjoint pairs
        [0.0, 0.0, 0.7, 0.7],    # same gt, equal IoU on two preds
    ], np.float32)
    ours = M.match_predictions(pc, tc, iou)
    ref = oracle_match_predictions(
        torch.from_numpy(pc), torch.from_numpy(tc),
        torch.from_numpy(iou)).numpy()
    np.testing.assert_array_equal(ours, ref)
    # gt2's equal-IoU tie resolves to the lower pred index (2)
    assert ours[2, 4] and not ours[3, 4]        # thr 0.70


def test_interp_matches_oracle_incl_boundaries():
    rng = np.random.default_rng(1)
    xp = np.sort(rng.uniform(0.1, 0.9, 17)).astype(np.float32)
    fp = rng.uniform(0, 1, 17).astype(np.float32)
    # hit both boundaries exactly plus interior points
    x = np.concatenate([[0.0, xp[0], 0.5, xp[-1], 1.0],
                        rng.uniform(0, 1, 50)]).astype(np.float32)
    for left in (0.0, 1.0):
        ours = M.interp(x, xp, fp, left=left)
        ref = oracle_interp(torch.from_numpy(x), torch.from_numpy(xp),
                            torch.from_numpy(fp), left=left).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    # the quirk itself: x == xp[0] takes the left fill, not fp[0]
    assert M.interp(np.array([xp[0]]), xp, fp, left=0.5)[0] == 0.5


def test_smooth_matches_oracle():
    rng = np.random.default_rng(2)
    for n, f in [(1000, 0.1), (1000, 0.05), (37, 0.1)]:
        y = rng.uniform(0, 1, n).astype(np.float32)
        ours = M.smooth(y, f)
        ref = oracle_smooth(torch.from_numpy(y), f).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_compute_ap_matches_oracle():
    rng = np.random.default_rng(3)
    for _ in range(10):
        n = int(rng.integers(1, 40))
        recall = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
        precision = rng.uniform(0.2, 1, n).astype(np.float32)
        ours, mpre, mrec = M.compute_ap(recall, precision)
        ref, _, _ = oracle_compute_ap(torch.from_numpy(recall),
                                      torch.from_numpy(precision))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_ap_per_class_full_chain_vs_oracle():
    """End-to-end: randomized multi-image prediction sets -> TP matrices
    via match_predictions -> ap_per_class; identical headline metrics."""
    rng = np.random.default_rng(4)
    for trial in range(5):
        tps, confs, pcls, tcls = [], [], [], []
        for _ in range(8):  # 8 images
            n_gt = int(rng.integers(1, 10))
            n_pred = int(rng.integers(0, 25))
            pc, tc, iou = _random_scene(rng, n_gt, n_pred, n_cls=5)
            tp = M.match_predictions(pc, tc, iou)
            ref_tp = oracle_match_predictions(
                torch.from_numpy(pc), torch.from_numpy(tc),
                torch.from_numpy(iou)).numpy()
            np.testing.assert_array_equal(tp, ref_tp)
            tps.append(tp)
            confs.append(rng.uniform(0.01, 1, n_pred))  # distinct w.p. 1
            pcls.append(pc)
            tcls.append(tc)
        tp = np.concatenate(tps)
        conf = np.concatenate(confs).astype(np.float32)
        pc = np.concatenate(pcls)
        tc = np.concatenate(tcls)
        ours = M.ap_per_class(tp, conf, pc, tc)
        ref = oracle_ap_per_class(torch.from_numpy(tp), torch.from_numpy(conf),
                                  torch.from_numpy(pc), torch.from_numpy(tc))
        np.testing.assert_array_equal(ours["unique_classes"],
                                      ref["unique_classes"].numpy())
        for key in ("p", "r", "f1", "ap", "tp", "fp"):
            np.testing.assert_allclose(
                ours[key], ref[key].numpy(), rtol=1e-4, atol=1e-5,
                err_msg=f"trial {trial} key {key}")
        # headline numbers incl. the reference's ap[:,1:] mAP50-95 slice
        p, r, map50, map5095 = M.summarize(ours)
        ref_ap = ref["ap"].numpy()
        np.testing.assert_allclose(map50, ref_ap[:, 0].mean(), rtol=1e-4)
        np.testing.assert_allclose(map5095, ref_ap[:, 1:].mean(), rtol=1e-4)
