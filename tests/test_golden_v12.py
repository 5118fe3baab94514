"""Full-model golden parity for YOLOv12n: our assembly (A2C2f area
attention with chunked sequences, 7x7 depthwise positional conv, conv-MLP)
vs an independent torch oracle sharing the SAME weights.

Reference spec: Yolo.cs:260-315 (v12 layer table), Block.cs:891-1118
(A2C2f/ABlock/AAttn). Also exercises the Pallas attention kernel's
CPU fallback numerics in-graph.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_golden_full_model import TBottle, TConv  # noqa: E402
from test_golden_v11 import TC3k, TC3k2, TDetect11  # noqa: E402


class TDW7(torch.nn.Module):
    """7x7 depthwise conv WITH bias + BN + SiLU (ABlock pe)."""

    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 7, 1, 3, groups=c, bias=True)
        self.bn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class TAAttn(torch.nn.Module):
    """Area attention: full attention within `area` contiguous chunks of
    the flattened H*W sequence (Block.cs:1029-1118)."""

    def __init__(self, dim, num_heads, area=1):
        super().__init__()
        self.nh = num_heads
        self.hd = dim // num_heads
        self.area = area
        self.scale = self.hd ** -0.5
        self.qkv = TConv(dim, dim * 3, 1)
        self.proj = TConv(dim, dim, 1)
        self.pe = TDW7(dim)

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        a = self.area
        qkv = self.qkv(x).flatten(2)                   # (b, 3C, n)
        # channel layout is per-head [q, k, v] blocks (head * 3hd + slot);
        # the sequence chunks into `a` contiguous pieces
        qkv = qkv.view(b, self.nh, 3 * self.hd, a, n // a)
        q, k, v = qkv.split([self.hd, self.hd, self.hd], dim=2)
        q_ = q.permute(0, 1, 3, 4, 2)                  # (b, nh, a, nc, hd)
        k_ = k.permute(0, 1, 3, 4, 2)
        v_ = v.permute(0, 1, 3, 4, 2)
        attn = (q_ @ k_.transpose(-2, -1)) * self.scale  # (b, nh, a, nc, nc)
        attn = attn.softmax(dim=-1)
        out = attn @ v_                                # (b, nh, a, nc, hd)
        # back to (b, C, h, w): channel = head * hd + d, n = a * nc
        out = out.permute(0, 1, 4, 2, 3).reshape(b, c, hh, ww)
        v_map = v.reshape(b, c, n).view(b, c, hh, ww)
        out = out + self.pe(v_map)
        return self.proj(out)


class TABlock(torch.nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=2.0, area=1):
        super().__init__()
        self.attn = TAAttn(dim, num_heads, area)
        hidden = int(dim * mlp_ratio)
        self.mlp = torch.nn.Sequential(TConv(dim, hidden, 1),
                                       TConv(hidden, dim, 1))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.mlp(x)


class TA2C2f(torch.nn.Module):
    def __init__(self, c1, c2, n=1, a2=True, area=1, mlp_ratio=2.0):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv((1 + n) * c_, c2, 1)
        mods = []
        for _ in range(n):
            if a2:
                mods.append(torch.nn.Sequential(
                    TABlock(c_, c_ // 32, mlp_ratio, area),
                    TABlock(c_, c_ // 32, mlp_ratio, area)))
            else:
                mods.append(TC3k(c_, c_, 2))
        self.m = torch.nn.ModuleList(mods)

    def forward(self, x):
        y = [self.cv1(x)]
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TYolov12n(torch.nn.Module):
    def __init__(self, nc=80):
        super().__init__()
        w = [16, 32, 64, 128, 256]
        self.model = torch.nn.ModuleList([
            TConv(3, w[0], 3, 2), TConv(w[0], w[1], 3, 2),
            TC3k2(w[1], w[2], 1, False, 0.25), TConv(w[2], w[2], 3, 2),
            TC3k2(w[2], w[3], 1, False, 0.25), TConv(w[3], w[3], 3, 2),
            TA2C2f(w[3], w[3], 2, True, 4), TConv(w[3], w[4], 3, 2),
            TA2C2f(w[4], w[4], 2, True, 1),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),  # concat marker
            TA2C2f(w[3] + w[4], w[3], 1, False),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),
            TA2C2f(w[3] + w[3], w[2], 1, False),
            TConv(w[2], w[2], 3, 2), torch.nn.Identity(),
            TA2C2f(w[2] + w[3], w[3], 1, False),
            TConv(w[3], w[3], 3, 2), torch.nn.Identity(),
            TC3k2(w[3] + w[4], w[4], 1, True),
            TDetect11(nc, (w[2], w[3], w[4])),
        ])

    def forward(self, x):
        out_idx = {4, 6, 8, 11, 14, 17, 20}
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


def test_v12n_full_model_golden():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from yolosharp_tpu.ckpt import variables_to_state_dict
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    nc = 9
    cfg = ArchCfg(version="v12", size="n", task="detect", nc=nc)
    net = YoloNet(cfg)
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(4), jnp.asarray(x), False)

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
    oracle = TYolov12n(nc=nc)
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
