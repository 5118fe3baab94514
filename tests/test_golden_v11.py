"""Full-model golden parity for YOLOv11n: our assembly (C3k2, C2PSA
attention, non-legacy DWConv head towers) vs an independent torch oracle
sharing the SAME weights via the torch-named state dict.

Reference spec: Yolo.cs:200-258 (v11 layer table), Block.cs:611-662
(C3k/C3k2), Block.cs:664-810 (C2PSA/PSABlock/Attention), Head.cs (non-
legacy cv3 towers).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_golden_full_model import TBottle, TC2f, TConv, TSPPF  # noqa: E402


class TDW(torch.nn.Module):
    def __init__(self, c1, c2, k=3):
        super().__init__()
        import math

        g = math.gcd(c1, c2)
        self.conv = torch.nn.Conv2d(c1, c2, k, 1, k // 2, groups=g,
                                    bias=False)
        self.bn = torch.nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class TC3k(torch.nn.Module):
    """C3 with (3,3) bottlenecks (Block.cs:611-620)."""

    def __init__(self, c1, c2, n=2, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = torch.nn.Sequential(
            *(TBottle(c_, c_, True, (3, 3), 1.0) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


class TC3k2(torch.nn.Module):
    """C2f whose inner blocks are C3k or Bottleneck (Block.cs:623-662)."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = torch.nn.ModuleList(
            TC3k(self.c, self.c, 2) if c3k
            else TBottle(self.c, self.c, True, (3, 3), 0.5)
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TAttn(torch.nn.Module):
    """PSA attention (Block.cs:721-810); qkv/pe/proj keep the reference's
    SiLU convs."""

    def __init__(self, dim, num_heads, attn_ratio=0.5):
        super().__init__()
        self.nh = num_heads
        self.hd = dim // num_heads
        self.kd = int(self.hd * attn_ratio)
        self.scale = self.kd ** -0.5
        h = (self.kd * 2 + self.hd) * num_heads
        self.qkv = TConv(dim, h, 1)
        self.proj = TConv(dim, dim, 1)
        self.pe = TDW(dim, dim, 3)

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        qkv = self.qkv(x).flatten(2)                  # (b, C', n)
        qkv = qkv.view(b, self.nh, self.kd * 2 + self.hd, n)
        q, k, v = qkv.split([self.kd, self.kd, self.hd], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale  # (b, nh, n, n)
        attn = attn.softmax(dim=-1)
        out = (v @ attn.transpose(-2, -1)).view(b, c, hh, ww)
        out = out + self.pe(v.reshape(b, c, hh, ww))
        return self.proj(out)


class TPSABlock(torch.nn.Module):
    def __init__(self, c, num_heads):
        super().__init__()
        self.attn = TAttn(c, num_heads, 0.5)
        self.ffn = torch.nn.Sequential(TConv(c, c * 2, 1), TConv(c * 2, c, 1))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(torch.nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv(2 * self.c, c2, 1)
        self.m = torch.nn.Sequential(
            *(TPSABlock(self.c, self.c // 64) for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat([a, b], 1))


class TDetect11(torch.nn.Module):
    """Detect with the non-legacy DWConv cls towers (v11)."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = torch.nn.ModuleList(
            torch.nn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                                torch.nn.Conv2d(c2, 4 * reg_max, 1))
            for c in ch)
        self.cv3 = torch.nn.ModuleList(
            torch.nn.Sequential(
                torch.nn.Sequential(TDW(c, c, 3), TConv(c, c3, 1)),
                torch.nn.Sequential(TDW(c3, c3, 3), TConv(c3, c3, 1)),
                torch.nn.Conv2d(c3, nc, 1))
            for c in ch)

    def forward(self, feats):
        return ([m(f) for m, f in zip(self.cv2, feats)],
                [m(f) for m, f in zip(self.cv3, feats)])


class TYolov11n(torch.nn.Module):
    def __init__(self, nc=80):
        super().__init__()
        w = [16, 32, 64, 128, 256]
        self.model = torch.nn.ModuleList([
            TConv(3, w[0], 3, 2), TConv(w[0], w[1], 3, 2),
            TC3k2(w[1], w[2], 1, False, 0.25), TConv(w[2], w[2], 3, 2),
            TC3k2(w[2], w[3], 1, False, 0.25), TConv(w[3], w[3], 3, 2),
            TC3k2(w[3], w[3], 1, True), TConv(w[3], w[4], 3, 2),
            TC3k2(w[4], w[4], 1, True), TSPPF(w[4], w[4], 5),
            TC2PSA(w[4], w[4], 1),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),  # concat marker
            TC3k2(w[3] + w[4], w[3], 1, False),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),
            TC3k2(w[3] + w[3], w[2], 1, False),
            TConv(w[2], w[2], 3, 2), torch.nn.Identity(),
            TC3k2(w[2] + w[3], w[3], 1, False),
            TConv(w[3], w[3], 3, 2), torch.nn.Identity(),
            TC3k2(w[3] + w[4], w[4], 1, True),
            TDetect11(nc, (w[2], w[3], w[4])),
        ])

    def forward(self, x):
        out_idx = {4, 6, 10, 13, 16, 19, 22}
        concat_idx = [1, 0, 3, 2]
        outputs, cat = [], 0
        for i, m in enumerate(self.model):
            if isinstance(m, TDetect11):
                return m(outputs[-3:])
            if isinstance(m, torch.nn.Identity):
                x = torch.cat([x, outputs[concat_idx[cat]]], 1)
                cat += 1
            else:
                x = m(x)
            if i in out_idx:
                outputs.append(x)
        raise AssertionError


def test_v11n_full_model_golden():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from yolosharp_tpu.ckpt import variables_to_state_dict
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    nc = 13
    cfg = ArchCfg(version="v11", size="n", task="detect", nc=nc)
    net = YoloNet(cfg)
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(3), jnp.asarray(x), False)

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

    sd = variables_to_state_dict(variables)
    oracle = TYolov11n(nc=nc)
    osd = {}
    for k, v in sd.items():
        k2 = k[len("model."):] if k.startswith("model.") else k
        if "dfl" in k2 or "num_batches" in k2:
            continue
        osd["model." + k2] = torch.from_numpy(np.asarray(v).copy())
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
