"""Golden: the classification model (v8n trunk + Classify head) vs an
independent torch oracle (Head.cs:612-644, Yolo.cs classify variants)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_golden_full_model import TC2f, TConv, TSPPF  # noqa: E402


class TClassify(torch.nn.Module):
    def __init__(self, c1, nc):
        super().__init__()
        c_ = 1280
        self.conv = TConv(c1, c_, 1, 1)
        self.linear = torch.nn.Linear(c_, nc)

    def forward(self, x):
        y = self.conv(x).mean(dim=(2, 3))
        return self.linear(y)


class TYolov8nCls(torch.nn.Module):
    """v8 classify trunk = detect layers 0..8 (Yolo.cs:518-539: _CLS keeps
    9 layers, dropping SPPF and the neck) + Classify."""

    def __init__(self, nc):
        super().__init__()
        w = [16, 32, 64, 128, 256]
        d = [1, 2]
        self.model = torch.nn.ModuleList([
            TConv(3, w[0], 3, 2), TConv(w[0], w[1], 3, 2),
            TC2f(w[1], w[1], d[0], True), TConv(w[1], w[2], 3, 2),
            TC2f(w[2], w[2], d[1], True), TConv(w[2], w[3], 3, 2),
            TC2f(w[3], w[3], d[1], True), TConv(w[3], w[4], 3, 2),
            TC2f(w[4], w[4], d[0], True),
            TClassify(w[4], nc),
        ])

    def forward(self, x):
        for m in self.model:
            x = m(x)
        return x


def test_v8n_classify_golden():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from yolosharp_tpu.ckpt import variables_to_state_dict
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    nc = 11
    cfg = ArchCfg(version="v8", size="n", task="classify", nc=nc)
    net = YoloNet(cfg)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(1), jnp.asarray(x), False)

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
    oracle = TYolov8nCls(nc)
    osd = {}
    for k, v in sd.items():
        k2 = k[len("model."):] if k.startswith("model.") else k
        if "num_batches" in k2:
            continue
        arr = np.asarray(v).copy()
        osd["model." + k2] = torch.from_numpy(arr)
    missing, unexpected = oracle.load_state_dict(osd, strict=False)
    assert not unexpected, unexpected
    real_missing = [m for m in missing if "num_batches" not in m]
    assert not real_missing, real_missing
    oracle.eval()

    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    preds = net.apply(variables, jnp.asarray(x), False)
    got = np.asarray(preds["cls"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
