"""End-to-end golden predict on a real image (bus.jpg).

Closes the round-1 gap: the full user-facing pipeline —
YoloTask.image_predict (pad-to-32 / 255-normalize / forward / DFL decode /
class-offset greedy NMS / YoloResult conversion) — verified against an
independent torch oracle running the reference algorithm
(Models/Detector.cs:27-72 + Utils/Ops.cs:239-371) with the SAME weights on
the SAME real image.

The weights travel through the checkpoint layer (variables -> torch state
dict), so this also exercises the name mapping end to end.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from test_golden_full_model import TYolov8n  # noqa: E402

BUS = "/root/reference/YoloSharpDemo/Assets/TestImage/bus.jpg"


def _torch_xywh2xyxy(x):
    y = x.clone()
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def _torch_box_iou(a, b, eps=1e-7):
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None] - inter + eps)


def _oracle_predict(model, img, conf_thres, iou_thres, nc,
                    max_det=300, max_wh=7680.0):
    """Reference predict pipeline in torch: Detector.cs:27-72 + Ops.cs:239-371."""
    x = torch.from_numpy(img).permute(2, 0, 1)[None].float()
    h, w = x.shape[2:]
    ph, pw = (32 - h % 32) % 32, (32 - w % 32) % 32
    x = torch.nn.functional.pad(x, (0, pw, 0, ph), value=114.0) / 255.0
    with torch.no_grad():
        tbox, tcls = model(x)

    # decode (Head.cs:204-223): DFL softmax-expectation + dist2bbox * stride
    rb = torch.cat([b.flatten(2) for b in tbox], -1)[0]  # (64, A)
    rc = torch.cat([c.flatten(2) for c in tcls], -1)[0]  # (nc, A)
    a_ = rb.shape[-1]
    d = rb.view(4, 16, a_).permute(0, 2, 1).softmax(-1) \
        @ torch.arange(16, dtype=torch.float32)          # (4, A)
    anchors, strides = [], []
    for f, s in zip(tbox, (8, 16, 32)):
        fh, fw = f.shape[2:]
        ys, xs = torch.meshgrid(torch.arange(fh), torch.arange(fw),
                                indexing="ij")
        anchors.append(torch.stack([xs.flatten() + 0.5,
                                    ys.flatten() + 0.5], 0).float())
        strides.append(torch.full((1, fh * fw), float(s)))
    anc = torch.cat(anchors, 1)
    strd = torch.cat(strides, 1)
    lt, rbx = d[:2], d[2:]
    x1y1, x2y2 = anc - lt, anc + rbx
    boxes_xywh = (torch.cat([(x1y1 + x2y2) / 2, x2y2 - x1y1], 0) * strd).T
    scores = rc.sigmoid().T                               # (A, nc)

    # non_max_suppression (Ops.cs:239-371)
    conf, cls = scores.max(1)
    keep = conf > conf_thres
    b, c, k = boxes_xywh[keep], conf[keep], cls[keep]
    order = c.argsort(descending=True)[:30000]
    b, c, k = b[order], c[order], k[order]
    xyxy = _torch_xywh2xyxy(b)
    off = xyxy + (k[:, None].float() * max_wh)
    n = len(off)
    suppressed = torch.zeros(n, dtype=torch.bool)
    kept = []
    for i in range(n):
        if suppressed[i]:
            continue
        kept.append(i)
        if i + 1 < n:
            iou = _torch_box_iou(off[i:i + 1], off[i + 1:])[0]
            suppressed[i + 1:] |= iou > iou_thres
    kept = kept[:max_det]
    return xyxy[kept].numpy(), c[kept].numpy(), k[kept].numpy()


def test_bus_image_full_pipeline_golden():
    import jax

    from yolosharp_tpu.ckpt import variables_to_state_dict
    from yolosharp_tpu.config import Config
    from yolosharp_tpu.tasks import YoloTask
    from yolosharp_tpu.types import TaskType, YoloSize, YoloType

    assert os.path.exists(BUS), BUS
    nc = 80
    cfg = Config(task_type=TaskType.detect, yolo_type=YoloType.v8,
                 yolo_size=YoloSize.n, number_class=nc, end2end=False)
    task = YoloTask(cfg)
    det = task.task
    variables = det._ensure_variables()

    # Two adjustments make an *untrained* net produce NMS-meaningful
    # output: (a) torch-default kernel init decays activation variance
    # ~5x/layer (BN eval stats are identity at init), so by the head the
    # features are numerically zero — scale every ConvBN kernel by 2.5 to
    # keep activations alive through 22 layers; (b) the bias-prior head
    # init makes every anchor decode the same giant box — re-randomize the
    # head's final convs so boxes and scores vary per anchor.
    import re

    from yolosharp_tpu.ckpt.mapping import flatten, head_index, unflatten

    params = flatten(variables["params"])
    hidx = head_index(variables["params"])
    prng = np.random.default_rng(3)
    for key in list(params):
        if key.endswith(".conv.kernel"):
            params[key] = (np.asarray(params[key]) * 2.5).astype(np.float32)
        if re.match(rf"^{hidx}\.cv[23]\.\d\.2\.(kernel|bias)$", key):
            params[key] = prng.uniform(
                -0.3, 0.3, np.shape(params[key])).astype(np.float32)
    variables = dict(variables)
    variables["params"] = unflatten(params, det.variables["params"])
    det.variables = variables

    # ship identical weights to the torch oracle
    sd = variables_to_state_dict(variables)
    oracle = TYolov8n(nc=nc)
    osd = {}
    for key, v in sd.items():
        k2 = key[len("model."):] if key.startswith("model.") else key
        if "dfl" in k2 or "num_batches" in k2:
            continue
        osd["model." + k2] = torch.from_numpy(np.asarray(v))
    missing, unexpected = oracle.load_state_dict(osd, strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if "num_batches" not in m], missing
    oracle.eval()

    # real image, downscaled (keeps the CPU suite fast) to a non-multiple-
    # of-32 size so the pad-to-32 path is exercised
    img = cv2.cvtColor(cv2.imread(BUS, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (236, 316)).astype(np.float32)  # -> pad 256x320

    # bias-prior scores are tiny; pick conf so ~200 candidates enter NMS
    x = torch.from_numpy(img).permute(2, 0, 1)[None]
    x = torch.nn.functional.pad(x, (0, 20, 0, 4), value=114.0) / 255.0
    with torch.no_grad():
        _, tcls = oracle(x)
    flat = torch.cat([c.sigmoid().amax(1).flatten() for c in tcls]).numpy()
    conf_thres = float(np.quantile(flat, 1 - 200 / len(flat)))
    n_cand = int((flat > conf_thres).sum())
    assert 20 <= n_cand <= 400, n_cand

    want_boxes, want_scores, want_cls = _oracle_predict(
        oracle, img, conf_thres, 0.45, nc)
    assert len(want_boxes) > 5  # the NMS actually did something

    # ours: the NMS-level predict fn (pre-int-truncation). The fn takes
    # the uint8 padded canvas and normalizes on device (image_predict's
    # uint8-transport contract).
    import jax.numpy as jnp

    arr = np.asarray(img, np.uint8)[None]
    ph, pw = (-arr.shape[1]) % 32, (-arr.shape[2]) % 32
    if ph or pw:
        arr = np.pad(arr, ((0, 0), (0, ph), (0, pw), (0, 0)),
                     constant_values=114)
    fn = det._predict_fn(arr.shape)
    out = jax.device_get(fn(det._predict_variables(), jnp.asarray(arr),
                            conf_thres, 0.45))
    valid = out.valid[0]
    got_boxes = out.boxes[0][valid]
    got_scores = out.scores[0][valid]
    got_cls = out.classes[0][valid]

    # 1-1 match: counts equal (tolerate <=2 threshold-edge flips), each
    # oracle row reproduced within 0.5 px / 1e-3 score
    assert abs(len(got_boxes) - len(want_boxes)) <= 2, \
        (len(got_boxes), len(want_boxes))
    used = np.zeros(len(got_boxes), bool)
    unmatched = 0
    for wb, ws, wc in zip(want_boxes, want_scores, want_cls):
        d = np.abs(got_boxes - wb).max(1) + 1e3 * (got_cls != wc)
        j = int(np.argmin(d + 1e6 * used))
        if d[j] < 0.5 and abs(got_scores[j] - ws) < 1e-3:
            used[j] = True
        else:
            unmatched += 1
    assert unmatched <= max(2, len(want_boxes) // 50), unmatched

    # and the public facade returns the same detections as YoloResults
    results = det.image_predict(img, conf_thres, 0.45)
    assert abs(len(results) - len(want_boxes)) <= 2
    for r, (x1, y1, x2, y2) in zip(
            sorted(results, key=lambda r: -r.score)[:5],
            got_boxes[np.argsort(-got_scores)][:5]):
        assert abs((r.center_x - r.width // 2) - int(x1)) <= 1
        assert abs((r.center_y - r.height // 2) - int(y1)) <= 1
