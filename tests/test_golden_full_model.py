"""Full-model golden parity: our YOLOv8n/v5un detect pipeline vs an
independent torch oracle, sharing the SAME weights via the .bin round-trip.

This closes the loop the backbone test opened: model assembly + Detect head
wiring + DFL/anchor decode must agree with a from-scratch torch
implementation of the same architecture to ~1e-3 on the decoded boxes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------------
# torch oracle blocks (independent re-implementation, NCHW)

class TConv(torch.nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, act=True):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = torch.nn.Conv2d(c1, c2, k, s, p, bias=False)
        self.bn = torch.nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = torch.nn.SiLU() if act else torch.nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottle(torch.nn.Module):
    def __init__(self, c1, c2, shortcut=True, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0])
        self.cv2 = TConv(c_, c2, k[1])
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(torch.nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = torch.nn.ModuleList(
            TBottle(self.c, self.c, shortcut, (3, 3), 1.0) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TSPPF(torch.nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, act=False)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = torch.nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TDetect(torch.nn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.nc, self.reg_max = nc, reg_max
        self.cv2 = torch.nn.ModuleList(
            torch.nn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                                torch.nn.Conv2d(c2, 4 * reg_max, 1))
            for c in ch)
        self.cv3 = torch.nn.ModuleList(
            torch.nn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                                torch.nn.Conv2d(c3, nc, 1))
            for c in ch)

    def forward(self, feats):
        return ([m(f) for m, f in zip(self.cv2, feats)],
                [m(f) for m, f in zip(self.cv3, feats)])


class TYolov8n(torch.nn.Module):
    def __init__(self, nc=80):
        super().__init__()
        w = [16, 32, 64, 128, 256]
        d = [1, 2]
        self.model = torch.nn.ModuleList([
            TConv(3, w[0], 3, 2), TConv(w[0], w[1], 3, 2),
            TC2f(w[1], w[1], d[0], True), TConv(w[1], w[2], 3, 2),
            TC2f(w[2], w[2], d[1], True), TConv(w[2], w[3], 3, 2),
            TC2f(w[3], w[3], d[1], True), TConv(w[3], w[4], 3, 2),
            TC2f(w[4], w[4], d[0], True), TSPPF(w[4], w[4], 5),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),  # concat marker
            TC2f(w[3] + w[4], w[3], d[0]),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),
            TC2f(w[2] + w[3], w[2], d[0]),
            TConv(w[2], w[2], 3, 2), torch.nn.Identity(),
            TC2f(w[2] + w[3], w[3], d[0]),
            TConv(w[3], w[3], 3, 2), torch.nn.Identity(),
            TC2f(w[4] + w[3], w[4], d[0]),
            TDetect(nc, (w[2], w[3], w[4])),
        ])

    def forward(self, x):
        out_idx = {4, 6, 9, 12, 15, 18, 21}
        concat_idx = [1, 0, 3, 2]
        outputs, cat = [], 0
        for i, m in enumerate(self.model):
            if isinstance(m, TDetect):
                return m(outputs[-3:])
            if isinstance(m, torch.nn.Identity):
                x = torch.cat([x, outputs[concat_idx[cat]]], 1)
                cat += 1
            else:
                x = m(x)
            if i in out_idx:
                outputs.append(x)
        raise AssertionError


def test_v8n_full_model_golden():
    import jax
    import jax.numpy as jnp

    from yolosharp_tpu.ckpt import state_dict_to_variables, \
        variables_to_state_dict
    from yolosharp_tpu.loss.losses import flatten_levels
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    nc = 17  # nonstandard to exercise the head channel math
    cfg = ArchCfg(version="v8", size="n", task="detect", nc=nc)
    net = YoloNet(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(7), jnp.asarray(x), False)

    # randomize batch stats so BN actually transforms
    import jax.tree_util as jtu

    def jitter(path, v):
        name = path[-1].key
        if name == "mean":
            return v + 0.05
        if name == "var":
            return v * 1.3 + 0.02
        return v

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        jitter, variables["batch_stats"])

    # ship OUR weights to the torch oracle via the torch-named state dict
    sd = variables_to_state_dict(variables)
    oracle = TYolov8n(nc=nc)
    osd = {}
    for k, v in sd.items():
        k2 = k[len("model."):] if k.startswith("model.") else k
        if "dfl" in k2 or "num_batches" in k2:
            continue
        osd["model." + k2] = torch.from_numpy(np.asarray(v))
    missing, unexpected = oracle.load_state_dict(osd, strict=False)
    assert not unexpected, unexpected
    real_missing = [m for m in missing if "num_batches" not in m]
    assert not real_missing, real_missing
    oracle.eval()

    with torch.no_grad():
        tbox, tcls = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    preds = net.apply(variables, jnp.asarray(x), False)
    o2m = preds["one2many"]
    for lvl in range(3):
        got_b = np.asarray(o2m["box"][lvl]).transpose(0, 3, 1, 2)
        got_c = np.asarray(o2m["cls"][lvl]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_b, tbox[lvl].numpy(), rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(got_c, tcls[lvl].numpy(), rtol=1e-3,
                                   atol=1e-3)

    # decoded boxes agree end to end
    from yolosharp_tpu.predict import decode_inference

    dec = np.asarray(decode_inference(o2m, nc=nc))  # (B, 4+nc, A)
    # torch-side decode
    rb = torch.cat([b.flatten(2) for b in tbox], -1)  # (B, 64, A)
    rc = torch.cat([c.flatten(2) for c in tcls], -1)
    b_, _, a_ = rb.shape
    d = rb.view(b_, 4, 16, a_).permute(0, 1, 3, 2).softmax(-1) \
        @ torch.arange(16, dtype=torch.float32)
    anchors = []
    for (h, w), s in zip([(12, 12), (6, 6), (3, 3)], [8, 16, 32]):
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        anchors.append(torch.stack(
            [xs.flatten() + 0.5, ys.flatten() + 0.5], 0) * 1.0)
    anc = torch.cat(anchors, 1)
    strides = torch.cat([torch.full((1, h * w), float(s))
                         for (h, w), s in zip([(12, 12), (6, 6), (3, 3)],
                                              [8, 16, 32])], 1)
    lt, rbx = d[:, :2], d[:, 2:]
    x1y1 = anc - lt
    x2y2 = anc + rbx
    want_box = torch.cat([(x1y1 + x2y2) / 2, x2y2 - x1y1], 1) * strides
    want = torch.cat([want_box, rc.sigmoid()], 1).numpy()
    np.testing.assert_allclose(dec, want, rtol=1e-3, atol=2e-3)
