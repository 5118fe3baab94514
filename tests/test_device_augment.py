"""Device-side batched augmentation vs the host cv2 reference path.

Same random draws (scripted fake rng) through both pipelines:
  host:   mosaic4 -> random_perspective -> flip -> random_hsv   (cv2)
  device: plan_mosaic_batch (labels) + mosaic_perspective_images (pixels)
Labels must match exactly (same numpy math); pixels match except on 1-px
tile seams where cv2 blends across tiles and we clamp into the border.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from yolosharp_tpu.config import Config
from yolosharp_tpu.data import augment as A
from yolosharp_tpu.data import device_augment as DA
from yolosharp_tpu.data.labels import LabelRecord


class FakeRng:
    """Replays a scripted draw sequence (uniforms and integers)."""

    def __init__(self, uniforms, integers):
        self.u = list(uniforms)
        self.i = list(integers)

    def uniform(self, lo=0.0, hi=1.0, size=None):
        assert size is None
        # samples beyond the scripted sequence (batch rows the test does
        # not inspect) get a fixed midpoint draw
        t = self.u.pop(0) if self.u else 0.5
        return lo + (hi - lo) * t

    def integers(self, lo, hi, size=None):
        if size is None:
            if not self.i:
                return lo
            v = self.i.pop(0)
            assert lo <= v < hi, (lo, v, hi)
            return v
        out = [self.integers(lo, hi) for _ in range(size)]
        return np.asarray(out)


def _mk_record(rng, h, w, n_boxes, imgsz):
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    rec = LabelRecord(im_file="x", img=np.ascontiguousarray(img),
                      org_shape=(h, w), resized_shape=(h, w), mask_ratio=4)
    cx = rng.uniform(0.2, 0.8, n_boxes) * w
    cy = rng.uniform(0.2, 0.8, n_boxes) * h
    bw = rng.uniform(0.1, 0.3, n_boxes) * w
    bh = rng.uniform(0.1, 0.3, n_boxes) * h
    rec.bboxes = np.stack([cx - bw / 2, cy - bh / 2,
                           cx + bw / 2, cy + bh / 2], -1).astype(np.float32)
    rec.cls = rng.integers(0, 5, n_boxes).astype(np.float32)
    return rec


DRAWS_U = [0.3, 0.7,      # P (perspective x2)
           0.6,           # angle
           0.45,          # scale
           0.5, 0.52,     # shear x2
           0.48, 0.55,    # translate x2
           0.2,           # flip_lr decision (<= 0.5 -> flip)
           0.9,           # flip_ud decision (no)
           0.4, 0.6, 0.5]  # hsv b, s, h


def test_device_mosaic_matches_host():
    import jax

    imgsz = 64
    rng = np.random.default_rng(0)
    recs = [_mk_record(rng, 64, 48, 3, imgsz), _mk_record(rng, 40, 64, 2, imgsz),
            _mk_record(rng, 64, 64, 2, imgsz), _mk_record(rng, 56, 40, 3, imgsz)]
    cfg = Config(image_size=imgsz, degrees=10.0, translate=0.1, scale=0.5,
                 shear=2.0, perspective=0.0005, flip_lr=0.5, flip_ud=0.0,
                 hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)

    yc, xc = 70, 55

    # ---------------- host path
    host_rng = FakeRng(DRAWS_U, [yc, xc])
    rec = A.mosaic4(recs[0], recs[1:], imgsz, host_rng)
    rec = A.random_perspective(rec, cfg.degrees, cfg.translate, cfg.scale,
                               cfg.shear, cfg.perspective, host_rng)
    flip_draw = host_rng.uniform()
    assert flip_draw <= cfg.flip_lr
    rec = A.flip_lr(rec)
    rec = A.random_hsv(rec, cfg.hsv_h, cfg.hsv_s, cfg.hsv_v, host_rng)
    host_img = rec.img.astype(np.float32)
    host_boxes = rec.bboxes
    host_cls = rec.cls

    # ---------------- device path (identical draws; picks map to recs 1..3)
    dev_rng = FakeRng(DRAWS_U, [1, 2, 3, yc, xc])
    plan, labels = DA.plan_mosaic_batch(recs, cfg, dev_rng)
    # only sample 0's plan row is exercised (plan_mosaic_batch consumed the
    # scripted draws for sample 0; stop there)
    lab = labels[0]
    np.testing.assert_allclose(np.sort(lab.cls), np.sort(host_cls))
    # order can differ only if filters disagree; they share the same math
    order_h = np.lexsort(host_boxes.T)
    order_d = np.lexsort(lab.bboxes.T)
    np.testing.assert_allclose(lab.bboxes[order_d], host_boxes[order_h],
                               atol=1e-3)
    np.testing.assert_array_equal(lab.cls[order_d], host_cls[order_h])

    pool = np.full((4, imgsz, imgsz, 3), 114, np.uint8)
    for k, r in enumerate(recs):
        h, w = r.resized_shape
        pool[k, :h, :w] = r.img
    arrays = (plan.src_idx[:1], plan.rects[:1], plan.pads[:1],
              plan.minv[:1], plan.persp[:1], plan.flips[:1], plan.hsv[:1])
    out = np.asarray(jax.jit(
        lambda p, a: DA.mosaic_perspective_images(p, a, imgsz)
    )(pool, arrays))[0]

    diff = np.abs(out - host_img).max(-1)
    frac_bad = float((diff > 6.0).mean())
    assert frac_bad < 0.05, f"{frac_bad:.3%} pixels differ"
    assert float(np.median(diff)) <= 2.0


def test_packed_render_and_train_step_match_plain():
    """packed=True render == space_to_depth2 of the plain render (the
    repack is free: only the gather's constant coordinate order changes),
    and a TRAIN-mode loss+grad through the packed stem
    (s2d_packed_input train path, nn/common.py) matches the plain path."""
    import jax
    import jax.numpy as jnp

    from yolosharp_tpu.loss import detection_loss
    from yolosharp_tpu.nn import ArchCfg, YoloNet
    from yolosharp_tpu.nn.common import s2d_packed_input, space_to_depth2

    imgsz = 64
    rng = np.random.default_rng(5)
    recs = [_mk_record(rng, 64, 48, 3, imgsz), _mk_record(rng, 40, 64, 2, imgsz),
            _mk_record(rng, 64, 64, 2, imgsz), _mk_record(rng, 56, 40, 3, imgsz)]
    cfg = Config(image_size=imgsz, degrees=10.0, translate=0.1, scale=0.5,
                 shear=2.0, perspective=0.0005, flip_lr=0.5, flip_ud=0.0,
                 hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    plan, _ = DA.plan_mosaic_batch(recs, cfg, rng)
    pool = np.full((4, imgsz, imgsz, 3), 114, np.uint8)
    for k, r in enumerate(recs):
        h, w = r.resized_shape
        pool[k, :h, :w] = r.img
    arrays = (plan.src_idx, plan.rects, plan.pads, plan.minv, plan.persp,
              plan.flips, plan.hsv)
    plain = jax.jit(lambda p, a: DA.mosaic_perspective_images(p, a, imgsz)
                    )(pool, arrays)
    packed = jax.jit(
        lambda p, a: DA.mosaic_perspective_images(p, a, imgsz, packed=True)
    )(pool, arrays)
    assert packed.shape == (4, imgsz // 2, imgsz // 2, 12)
    np.testing.assert_allclose(np.asarray(packed),
                               np.asarray(space_to_depth2(plain)),
                               rtol=1e-5, atol=1e-4)

    net = YoloNet(ArchCfg(version="v8", size="n", task="detect", nc=8))
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, imgsz, imgsz, 3), jnp.float32), False)
    batch = {"cls": rng.integers(0, 8, (4, 6)).astype(np.int32),
             "bboxes": rng.uniform(0.2, 0.6, (4, 6, 4)).astype(np.float32),
             "mask_gt": np.ones((4, 6), bool)}

    def loss_of(params, images, use_packed):
        import contextlib
        ctx = s2d_packed_input() if use_packed else contextlib.nullcontext()
        with ctx:
            preds, upd = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, True, mutable=["batch_stats"])
        loss, _ = detection_loss(preds["one2many"], batch, nc=8)
        return loss, upd["batch_stats"]

    gfn = jax.value_and_grad(loss_of, has_aux=True)
    (l0, bs0), g0 = gfn(variables["params"], plain / 255.0, False)
    (l1, bs1), g1 = gfn(variables["params"], packed / 255.0, True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # grads are reduction-order sensitive (the 2x2 repacked conv's kernel
    # grad sums the same terms in a different bracketing); loss and BN
    # stats above are the tight equality — grads checked at 1% rel with
    # an atol scaled to each leaf's magnitude (near-zero entries of a
    # ~1e2-magnitude kernel grad carry f32 cancellation noise)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        atol = max(1e-4 * float(np.abs(a).max()), 1e-5)
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=atol)


def test_separable_render_matches_gather():
    """With axis-aligned hyps (degrees == shear == perspective == 0, the
    reference defaults) the matmul-based separable render must reproduce
    the gather render exactly (f32 summation order only), plain and
    packed, including flips, HSV, the 114 border fill and tile seams."""
    import jax

    imgsz = 64
    rng = np.random.default_rng(3)
    recs = [_mk_record(rng, 64, 48, 2, imgsz), _mk_record(rng, 40, 64, 2, imgsz),
            _mk_record(rng, 64, 64, 2, imgsz), _mk_record(rng, 56, 40, 2, imgsz),
            _mk_record(rng, 64, 64, 2, imgsz), _mk_record(rng, 32, 64, 2, imgsz)]
    cfg = Config(image_size=imgsz, degrees=0.0, translate=0.1, scale=0.5,
                 shear=0.0, perspective=0.0, flip_lr=0.5, flip_ud=0.5,
                 hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    plan, _ = DA.plan_mosaic_batch(recs, cfg, rng)
    pool = np.full((len(recs), imgsz, imgsz, 3), 114, np.uint8)
    for k, r in enumerate(recs):
        h, w = r.resized_shape
        pool[k, :h, :w] = r.img
    arrays = (plan.src_idx, plan.rects, plan.pads, plan.minv, plan.persp,
              plan.flips, plan.hsv)
    for packed in (False, True):
        g = jax.jit(lambda p, a: DA.mosaic_perspective_images(
            p, a, imgsz, packed=packed))(pool, arrays)
        s = jax.jit(lambda p, a: DA.mosaic_perspective_images(
            p, a, imgsz, packed=packed, separable=True))(pool, arrays)
        assert s.shape == g.shape
        np.testing.assert_allclose(np.asarray(s), np.asarray(g),
                                   atol=0.02, rtol=0)


def test_separable_render_rejects_non_axis_aligned():
    """separable=True silently drops rotation/shear/perspective terms;
    the entry point must refuse a concrete plan that has them."""
    import pytest

    imgsz = 64
    rng = np.random.default_rng(5)
    recs = [_mk_record(rng, 64, 64, 2, imgsz) for _ in range(4)]
    cfg = Config(image_size=imgsz, degrees=10.0)   # rotation -> not aligned
    plan, _ = DA.plan_mosaic_batch(recs, cfg, rng)
    pool = np.stack([r.img for r in recs])
    arrays = (plan.src_idx, plan.rects, plan.pads, plan.minv, plan.persp,
              plan.flips, plan.hsv)
    with pytest.raises(ValueError, match="axis-aligned"):
        DA.mosaic_perspective_images(pool, arrays, imgsz, separable=True)


def test_device_hsv_matches_cv2():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    for gains in ((1.2, 0.8, 0.01), (0.7, 1.3, -0.01), (1.0, 1.0, 0.0)):
        rec = LabelRecord(im_file="x", img=img.copy(), org_shape=(32, 32),
                          resized_shape=(32, 32), mask_ratio=4)
        host_rng = FakeRng([(gains[0] - max(0, 1 - 0.4)) / (1 + 0.4 - max(0, 1 - 0.4)),
                            (gains[1] - max(0, 1 - 0.7)) / (1 + 0.7 - max(0, 1 - 0.7)),
                            (gains[2] + 0.015) / 0.03], [])
        out_h = A.random_hsv(rec, 0.015, 0.7, 0.4, host_rng).img.astype(np.float32)
        out_d = np.asarray(jax.jit(DA.apply_hsv)(
            jnp.asarray(img, jnp.float32), jnp.asarray(gains, jnp.float32)))
        diff = np.abs(out_d - out_h)
        assert float(np.median(diff)) <= 2.0
        assert float((diff > 8).mean()) < 0.02, float((diff > 8).mean())


ASSETS = "/root/reference/YoloSharpDemo/Assets/DataSets"
needs_assets = pytest.mark.skipif(not __import__("os").path.isdir(ASSETS),
                                  reason="reference datasets not mounted")


@needs_assets
@pytest.mark.slow
@pytest.mark.parametrize("task", ["detect", "segment"])
def test_device_augment_train_steps(task):
    """Full loop: loader plans on host, the jitted train step renders the
    mosaic batch on device and losses stay finite."""
    import os

    from test_e2e_train import _run_steps, _tiny_cfg
    from yolosharp_tpu import TaskType
    from yolosharp_tpu.tasks import Detector, Segmenter
    from yolosharp_tpu.types import ImageProcessType

    kw = dict(image_process_type=ImageProcessType.mosaic, device_augment=True)
    if task == "segment":
        cfg = _tiny_cfg(root_path=os.path.join(ASSETS, "coco128-seg"),
                        task_type=TaskType.segment, **kw)
        obj = Segmenter(cfg)
    else:
        cfg = _tiny_cfg(**kw)
        obj = Detector(cfg)
    losses = _run_steps(obj, cfg)
    assert losses[0] > 0


@needs_assets
def test_device_batch_contract():
    """device_batch ships a pool + plan (no images key) and the loader
    routes through it when mosaic is active."""
    import os

    from test_e2e_train import _tiny_cfg
    from yolosharp_tpu.data import DataLoader, YoloDataset
    from yolosharp_tpu.types import ImageProcessType

    cfg = _tiny_cfg(image_process_type=ImageProcessType.mosaic,
                    device_augment=True)
    ds = YoloDataset(cfg, is_val=False)
    ds.records = ds.records[:4]
    assert ds.use_device_augment()
    dl = DataLoader(ds, 2, workers=2, seed=0)
    batch = next(iter(dl))
    assert "aug_pool" in batch and "images" not in batch
    assert batch["aug_pool"].shape == (2, cfg.image_size, cfg.image_size, 3)
    assert batch["aug_src_idx"].max() < 2
    # close_mosaic flips back to the host path
    ds.close_mosaic(True)
    assert not ds.use_device_augment()
    batch2 = next(iter(DataLoader(ds, 2, workers=2, seed=0)))
    assert "images" in batch2 and "aug_pool" not in batch2


@needs_assets
def test_mosaic_partner_pool_dataset_wide():
    """Config.mosaic_partner_pool ships dataset-wide extras per shard
    group in block layout (the reference's partner distribution,
    YoloDataset.cs:65): pool grows by E per group, src_idx stays within
    each sample's own block, and some partner picks land on extras."""
    import os

    from test_e2e_train import _tiny_cfg
    from yolosharp_tpu.data import YoloDataset
    from yolosharp_tpu.types import ImageProcessType

    E = 6
    cfg = _tiny_cfg(image_process_type=ImageProcessType.mosaic,
                    device_augment=True, mosaic_partner_pool=E,
                    batch_size=4)
    ds = YoloDataset(cfg, is_val=False)
    ds.records = ds.records[:16]
    ml = ds.max_label_count
    # two shard groups of 2 (partner_group=2 as a 2-device mesh would set)
    batch = ds.device_batch(np.arange(4), ml, partner_group=2)
    gs, block = 2, 2 + E
    assert batch["aug_pool"].shape[0] == 2 * block
    assert batch["cls"].shape[0] == 4          # labels stay per-sample
    src = batch["aug_src_idx"]                 # (4, 4) pool rows
    for i in range(4):
        g = i // gs
        base = g * block
        assert src[i, 0] == base + i % gs      # main tile = itself
        assert (src[i] >= base).all() and (src[i] < base + block).all()
    # across a few batches, extras must actually get picked as partners
    picked_extra = False
    for seed in range(8):
        b2 = ds.device_batch(np.arange(4), ml, partner_group=2)
        s2 = b2["aug_src_idx"]
        for i in range(4):
            base = (i // gs) * block
            if (s2[i, 1:] >= base + gs).any():
                picked_extra = True
    assert picked_extra
    # and the rendered train step still runs: single group, whole batch
    from test_e2e_train import _run_steps
    from yolosharp_tpu.tasks import Detector

    cfg2 = _tiny_cfg(image_process_type=ImageProcessType.mosaic,
                     device_augment=True, mosaic_partner_pool=E)
    obj = Detector(cfg2)
    losses = _run_steps(obj, cfg2)
    assert losses[0] > 0
