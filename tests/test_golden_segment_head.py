"""Golden parity for the Segment head (proto + mask towers) vs a torch
oracle sharing weights via the torch-named state dict — extends the full-
model golden coverage beyond Detect."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_golden_full_model import TConv  # noqa: E402


class TProto(torch.nn.Module):
    """Block.cs Proto:51-84."""

    def __init__(self, c1, c_, c2):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = torch.nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, c2, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegHead(torch.nn.Module):
    """Head.cs Segment: cv2/cv3 towers + cv4 mask coeffs + proto."""

    def __init__(self, nc, ch, nm=32, npr=64, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        mk = lambda cin, mid, out: torch.nn.Sequential(
            TConv(cin, mid, 3), TConv(mid, mid, 3),
            torch.nn.Conv2d(mid, out, 1))
        self.cv2 = torch.nn.ModuleList(mk(c, c2, 4 * reg_max) for c in ch)
        self.cv3 = torch.nn.ModuleList(mk(c, c3, nc) for c in ch)
        self.cv4 = torch.nn.ModuleList(mk(c, c4, nm) for c in ch)
        self.proto = TProto(ch[0], npr, nm)

    def forward(self, feats):
        return ([m(f) for m, f in zip(self.cv2, feats)],
                [m(f) for m, f in zip(self.cv3, feats)],
                [m(f) for m, f in zip(self.cv4, feats)],
                self.proto(feats[0]))


def test_segment_head_golden():
    import jax
    import jax.numpy as jnp

    from yolosharp_tpu.ckpt import variables_to_state_dict
    from yolosharp_tpu.nn.heads import Segment

    nc, ch = 13, (32, 64, 128)
    head = Segment(nc=nc, ch=ch, npr=ch[0], nm=32)
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, (1, s, s, c)).astype(np.float32))
             for s, c in zip((16, 8, 4), ch)]
    variables = head.init(jax.random.PRNGKey(2), tuple(feats), False)

    # jitter BN stats so folding matters
    import jax.tree_util as jtu

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.03 if p[-1].key == "mean" else v * 1.2 + 0.01,
        variables["batch_stats"])

    sd = variables_to_state_dict({"params": {"0": variables["params"]},
                                  "batch_stats": {"0": variables["batch_stats"]}})
    oracle = TSegHead(nc, ch, npr=ch[0])
    osd = {}
    for k, v in sd.items():
        k2 = k[len("model.0."):]
        if "dfl" in k2 or "num_batches" in k2:
            continue
        osd[k2] = torch.from_numpy(np.asarray(v))
    missing, unexpected = oracle.load_state_dict(osd, strict=False)
    assert not unexpected, unexpected
    assert not [m for m in missing if "num_batches" not in m]
    oracle.eval()

    with torch.no_grad():
        tb, tc, tm, tp = oracle([torch.from_numpy(
            np.asarray(f).transpose(0, 3, 1, 2)) for f in feats])

    preds = head.apply(variables, tuple(feats), False)["one2many"]
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(preds["box"][lvl]).transpose(0, 3, 1, 2),
            tb[lvl].numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(preds["cls"][lvl]).transpose(0, 3, 1, 2),
            tc[lvl].numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(preds["mask"][lvl]).transpose(0, 3, 1, 2),
            tm[lvl].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(preds["proto"]).transpose(0, 3, 1, 2),
        tp.numpy(), rtol=1e-4, atol=1e-4)
