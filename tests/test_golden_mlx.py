"""m/l/x-size golden parity: the size-dependent paths the n-size full-model
goldens never reach, vs independent torch oracles sharing the SAME weights.

1. A2C2f(residual=True, mlp_ratio=1.2) — the learnable-gamma residual the
   v12 l/x backbone enables (Block.cs:891-983: gamma = 0.01*ones(c2) when
   a2 && residual; forward returns x + gamma.view(1,-1,1,1)*cv2(cat)).
2. Full-model YOLOv11m detect — pins the m-size width/depth/channel math
   (Yolo.cs:211-223: width 1.0 capped at 512, depth 0.5, useC3k=true), i.e.
   the C3k-bearing C3k2 blocks at e=0.25 AND e=0.5 widths plus the 4-head
   C2PSA that no n-size test instantiates.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_golden_full_model import TConv, TSPPF  # noqa: E402
from test_golden_v11 import (TC2PSA, TC3k2, TDetect11)  # noqa: E402
from test_golden_v12 import TABlock  # noqa: E402


class TA2C2fRes(torch.nn.Module):
    """A2C2f with the residual gamma path (Block.cs:891-983, a2+residual)."""

    def __init__(self, c1, c2, n=1, area=1, mlp_ratio=1.2, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv((1 + n) * c_, c2, 1)
        self.gamma = torch.nn.Parameter(0.01 * torch.ones(c2))
        self.m = torch.nn.ModuleList(
            torch.nn.Sequential(TABlock(c_, c_ // 32, mlp_ratio, area),
                                TABlock(c_, c_ // 32, mlp_ratio, area))
            for _ in range(n))

    def forward(self, x):
        y = [self.cv1(x)]
        for m in self.m:
            y.append(m(y[-1]))
        out = self.cv2(torch.cat(y, 1))
        return x + self.gamma.view(1, -1, 1, 1) * out


def _unit_state_dict(variables):
    from yolosharp_tpu.ckpt import variables_to_state_dict

    sd = variables_to_state_dict(
        {"params": {"0": variables["params"]},
         "batch_stats": {"0": variables.get("batch_stats", {})}})
    out = {}
    for k, v in sd.items():
        k2 = k[len("model.0."):]
        if "dfl" in k2 or "num_batches" in k2:
            continue
        out[k2] = torch.from_numpy(np.asarray(v).copy())
    return out


def _jitter_stats(variables):
    import jax.tree_util as jtu

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.05 if p[-1].key == "mean" else v * 1.3 + 0.02,
        variables["batch_stats"])
    return variables


@pytest.mark.parametrize("area,n", [(1, 2), (4, 2)])
def test_a2c2f_residual_golden(area, n):
    import jax
    import jax.numpy as jnp

    from yolosharp_tpu.nn.attention import A2C2f

    c = 64
    mod = A2C2f(c2=c, n=n, a2=True, area=area, residual=True, mlp_ratio=1.2)
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (2, 8, 8, c)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(7), jnp.asarray(x), False)
    variables = _jitter_stats(variables)

    oracle = TA2C2fRes(c, c, n=n, area=area, mlp_ratio=1.2)
    missing, unexpected = oracle.load_state_dict(
        _unit_state_dict(variables), strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if "num_batches" not in m], missing
    oracle.eval()

    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(mod.apply(variables, jnp.asarray(x),
                               False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # the gamma residual must actually engage: output != cv2 path alone
    assert np.abs(got - x.transpose(0, 3, 1, 2)).max() > 1e-4


class TYolov11m(torch.nn.Module):
    """v11 at size m: widths [64,128,256,512,512] (cap 512), depthSize=1,
    C3k inner blocks everywhere (Yolo.cs:211-258)."""

    def __init__(self, nc=80):
        super().__init__()
        w = [64, 128, 256, 512, 512]
        self.model = torch.nn.ModuleList([
            TConv(3, w[0], 3, 2), TConv(w[0], w[1], 3, 2),
            TC3k2(w[1], w[2], 1, True, 0.25), TConv(w[2], w[2], 3, 2),
            TC3k2(w[2], w[3], 1, True, 0.25), TConv(w[3], w[3], 3, 2),
            TC3k2(w[3], w[3], 1, True), TConv(w[3], w[4], 3, 2),
            TC3k2(w[4], w[4], 1, True), TSPPF(w[4], w[4], 5),
            TC2PSA(w[4], w[4], 1),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),  # concat marker
            TC3k2(w[3] + w[4], w[3], 1, True),
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Identity(),
            TC3k2(w[3] + w[3], w[2], 1, True),
            TConv(w[2], w[2], 3, 2), torch.nn.Identity(),
            TC3k2(w[2] + w[3], w[3], 1, True),
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


def test_v11m_full_model_golden():
    import jax
    import jax.numpy as jnp

    from yolosharp_tpu.ckpt import variables_to_state_dict
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    nc = 7
    cfg = ArchCfg(version="v11", size="m", task="detect", nc=nc)
    net = YoloNet(cfg)
    rng = np.random.default_rng(12)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(8), jnp.asarray(x), False)
    variables = _jitter_stats(variables)

    sd = variables_to_state_dict(variables)
    oracle = TYolov11m(nc=nc)
    osd = {}
    for k, v in sd.items():
        k2 = k[len("model."):] if k.startswith("model.") else k
        if "dfl" in k2 or "num_batches" in k2:
            continue
        osd["model." + k2] = torch.from_numpy(np.asarray(v).copy())
    missing, unexpected = oracle.load_state_dict(osd, strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if "num_batches" not in m], missing
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
