"""Val-at-scale: the full bucketed validation path end-to-end.

The reference's rectangle val batching gives every batch its own padded
shape (Data/YoloDataset.cs:339-363) — under jit each distinct shape is a
compiled program. Config.val_shape_buckets quantizes per-batch shapes to
<= N dominating shapes (data/labels.py bucket_shapes); this test drives a
~100-image mixed-aspect set through BaseTask.val and asserts the traced
eval-program count actually stays <= the bucket budget (the earlier
test_data.py bucket test covered bucket_shapes in isolation only), plus
that bucketing the coco128 fixture leaves its val metrics unchanged vs the
exact (buckets=0) protocol when the model produces real detections.
"""

import os

import numpy as np
import pytest

ASSETS = "/root/reference/YoloSharpDemo/Assets/DataSets"
needs_assets = pytest.mark.skipif(not os.path.isdir(ASSETS),
                                  reason="reference fixtures not present")


def _write_synth_dataset(root, n_images, seed=0):
    """YOLO-layout detect dataset with mixed aspect ratios."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images", "val")
    lab_dir = os.path.join(root, "labels", "val")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    for i in range(n_images):
        # aspect from wide 2:1 to tall 1:2, sizes larger than imgsz so the
        # eager resize path engages
        a = float(rng.uniform(0.5, 2.0))
        h = int(96 * min(1.0, a)) + int(rng.integers(0, 24))
        w = int(96 * min(1.0, 1 / a)) + int(rng.integers(0, 24))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"im{i:03d}.png"), img)
        with open(os.path.join(lab_dir, f"im{i:03d}.txt"), "w") as f:
            f.write(f"{int(rng.integers(0, 3))} 0.5 0.5 0.4 0.4\n")


def test_val_at_scale_program_count(tmp_path):
    """96 mixed-aspect images, batch 8 -> 12 batches whose exact rectangle
    shapes would compile ~12 eval programs; with val_shape_buckets=4 the
    jitted eval step must trace at most 4."""
    from yolosharp_tpu.config import Config
    from yolosharp_tpu.data import DataLoader, YoloDataset
    from yolosharp_tpu.tasks import Detector
    from yolosharp_tpu.types import TaskType, YoloSize, YoloType

    root = str(tmp_path / "ds")
    _write_synth_dataset(root, 96)
    cfg = Config(root_path=root, val_data_path="images/val",
                 train_data_path="images/val",
                 task_type=TaskType.detect, yolo_type=YoloType.v8,
                 yolo_size=YoloSize.n, number_class=3, image_size=64,
                 batch_size=8, workers=2, scalar_type="float32",
                 end2end=False, val_shape_buckets=4)
    det = Detector(cfg)
    ds = YoloDataset(cfg, is_val=True)
    assert len(ds) == 96
    # the DP quantizer kept every image inside its bucket shape
    rect_shapes = {r.rectangle_shape for r in ds.records}
    assert len(rect_shapes) <= 4, rect_shapes
    for r in ds.records:
        bh, bw = r.rectangle_shape
        rh, rw = r.resized_shape
        assert bh >= rh and bw >= rw

    dl = DataLoader(ds, cfg.batch_size, shuffle=False, workers=2)
    items, metrics = det.val(dl, epoch=1)
    assert np.isfinite(np.asarray(items)).all()
    assert len(metrics) == 4
    # the traced program count is the real guarantee: one compile per
    # bucket shape, nothing per-batch
    n_programs = det._eval_step._cache_size()
    assert n_programs <= 4, n_programs


@needs_assets
def test_val_buckets_keep_coco128_metrics(tmp_path):
    """Bucketed val (the default) vs exact per-batch shapes (buckets=0) on
    the coco128 fixture: at the fixture's scale the 12 val images produce
    <= 4 distinct rectangle shapes, so the default bucket budget must be
    an exact no-op — identical batch shapes, loss items, AND
    P/R/mAP50/mAP50-95, with real decoded detections in the accumulator
    (not a vacuous all-empty run). When a set genuinely exceeds the
    budget, padding changes content offsets and val_shape_buckets=0
    restores the reference-exact protocol (documented in config.py)."""
    from yolosharp_tpu.ckpt.mapping import flatten, head_index, unflatten
    from yolosharp_tpu.config import Config
    from yolosharp_tpu.data import DataLoader, YoloDataset
    from yolosharp_tpu.tasks import Detector
    from yolosharp_tpu.types import TaskType, YoloSize, YoloType

    def run(buckets):
        cfg = Config(root_path=os.path.join(ASSETS, "coco128"),
                     train_data_path="train.txt", val_data_path="val.txt",
                     task_type=TaskType.detect, yolo_type=YoloType.v8,
                     yolo_size=YoloSize.n, number_class=80, image_size=96,
                     batch_size=2, workers=2, scalar_type="float32",
                     end2end=False, val_shape_buckets=buckets)
        det = Detector(cfg)
        # the activation-alive recipe (test_golden_bus_predict): scaled
        # kernels + randomized head final convs -> real NMS-visible boxes
        variables = det._ensure_variables()
        params = flatten(variables["params"])
        hidx = head_index(variables["params"])
        prng = np.random.default_rng(3)
        import re
        for k in list(params):
            if k.endswith(".conv.kernel"):
                params[k] = (np.asarray(params[k]) * 2.5).astype(np.float32)
            if re.match(rf"^{hidx}\.cv[23]\.\d\.2\.(kernel|bias)$", k):
                params[k] = prng.uniform(
                    -0.3, 0.3, np.shape(params[k])).astype(np.float32)
            # shift cls biases up so scores clear val_conf (the bench.py
            # candidate-calibration trick) — detections must exist
            if re.match(rf"^{hidx}\.cv3\.\d\.2\.bias$", k):
                params[k] = np.asarray(params[k]) + 1.5
        det.variables = dict(variables)
        det.variables["params"] = unflatten(params, variables["params"])

        ds = YoloDataset(cfg, is_val=True)
        shapes = sorted({r.rectangle_shape for r in ds.records})
        dl = DataLoader(ds, cfg.batch_size, shuffle=False, workers=2)

        # spy on the accumulator so the equality below is provably
        # non-vacuous (decoded detections actually flowed through)
        n_dets = [0]
        orig_acc = det._accumulate_val

        def spy(acc, batch, decoded):
            n_dets[0] += int(np.asarray(decoded.valid).sum())
            return orig_acc(acc, batch, decoded)

        det._accumulate_val = spy
        items, metrics = det.val(dl, epoch=1)
        return np.asarray(items), np.asarray(metrics), shapes, n_dets[0]

    i_exact, m_exact, shapes_exact, n_exact = run(0)
    i_bucket, m_bucket, shapes_bucket, n_bucket = run(4)
    assert len(shapes_bucket) <= 4
    # the 12-image fixture fits the budget: bucketing is an exact no-op
    assert shapes_bucket == shapes_exact, (shapes_bucket, shapes_exact)
    assert n_exact > 0 and n_bucket == n_exact, (n_exact, n_bucket)
    np.testing.assert_allclose(i_bucket, i_exact, rtol=1e-6)
    np.testing.assert_allclose(m_bucket, m_exact, rtol=1e-6, atol=1e-9)
