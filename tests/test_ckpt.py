"""Checkpoint I/O tests: LEB128 .bin byte round-trip against the reference's
bundled Yolov5n.bin, safetensors round-trip, torch .pt reading, and
state-dict -> flax mapping with a golden forward check vs a torch oracle.
"""

import os

import numpy as np
import pytest

from yolosharp_tpu.ckpt import (load_bin, load_pt, load_safetensors, save_bin,
                                save_safetensors, state_dict_to_variables,
                                variables_to_state_dict, clone_one2one,
                                flatten)

REF_BIN = "/root/reference/YoloSharpDemo/Assets/PreTrainedModels/Yolov5n.bin"
needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference assets not mounted")


@needs_ref
def test_bin_reader_reference_file():
    sd = load_bin(REF_BIN)
    assert len(sd) == 348
    assert sd["model.0.conv.weight"].shape == (16, 3, 6, 6)
    assert sd["model.0.conv.weight"].dtype == np.float16
    assert sd["model.24.m.0.weight"].shape == (255, 64, 1, 1)
    # finite, sane values
    w = sd["model.0.conv.weight"].astype(np.float32)
    assert np.isfinite(w).all() and 1e-4 < np.abs(w).max() < 100


@needs_ref
def test_bin_roundtrip_bytes(tmp_path):
    sd = load_bin(REF_BIN)
    out = tmp_path / "copy.bin"
    save_bin(str(out), sd)
    assert out.read_bytes() == open(REF_BIN, "rb").read()


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sd = {"a.weight": rng.normal(size=(4, 3, 2, 2)).astype(np.float32),
          "b.bias": rng.normal(size=(7,)).astype(np.float16)}
    p = tmp_path / "x.safetensors"
    save_safetensors(str(p), sd)
    back = load_safetensors(str(p))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_pt_reader_state_dict(tmp_path):
    torch = pytest.importorskip("torch")
    m = torch.nn.Sequential(torch.nn.Conv2d(3, 8, 3), torch.nn.BatchNorm2d(8))
    p = tmp_path / "m.pt"
    torch.save(m.state_dict(), str(p))
    sd = load_pt(str(p))
    assert sd["0.weight"].shape == (8, 3, 3, 3)
    np.testing.assert_allclose(sd["0.weight"],
                               m.state_dict()["0.weight"].numpy())
    assert "1.running_mean" in sd


def test_pt_reader_module_pickle(tmp_path):
    torch = pytest.importorskip("torch")
    m = torch.nn.Sequential(torch.nn.Conv2d(3, 4, 1), torch.nn.ReLU())
    p = tmp_path / "full.pt"
    torch.save({"model": m}, str(p))
    sd = load_pt(str(p))
    assert sd["0.weight"].shape == (4, 3, 1, 1)
    np.testing.assert_allclose(sd["0.weight"], m[0].weight.detach().numpy())


def _v5n_variables():
    import jax
    import jax.numpy as jnp
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    cfg = ArchCfg(version="v5u", size="n", task="detect", nc=80)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    return net, variables


@needs_ref
def test_mapping_loads_v5_backbone():
    sd = load_bin(REF_BIN)
    _, variables = _v5n_variables()
    new_vars, report = state_dict_to_variables(sd, variables)
    # the whole backbone + neck (layers 0..23) must load; only the anchor-
    # based v5 head (model.24.m.*, anchors) mismatches our v5u head
    assert all(k.startswith("model.24") for k in report.unexpected)
    missing_nonhead = [k for k in report.missing if not k.startswith("24.")]
    assert missing_nonhead == [], missing_nonhead
    w = np.asarray(new_vars["params"]["0"]["conv"]["kernel"])
    assert w.shape == (6, 6, 3, 16)
    np.testing.assert_allclose(
        w, np.transpose(sd["model.0.conv.weight"].astype(np.float32),
                        (2, 3, 1, 0)))


@needs_ref
def test_backbone_golden_vs_torch_oracle():
    """Run layers 0..9 of v5n with REAL weights in both frameworks."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from yolosharp_tpu.nn.model import build_arch
    from yolosharp_tpu.nn import ArchCfg

    sd = {k: v.astype(np.float32) for k, v in load_bin(REF_BIN).items()}
    _, variables = _v5n_variables()
    new_vars, _ = state_dict_to_variables(sd, variables)

    # ---- torch oracle (independent implementation of Conv/C3/SPPF) ----
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
        def __init__(self, c1, c2, shortcut=True):
            super().__init__()
            self.cv1 = TConv(c1, c2, 1)
            self.cv2 = TConv(c2, c2, 3)
            self.add = shortcut and c1 == c2

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class TC3(torch.nn.Module):
        def __init__(self, c1, c2, n, shortcut=True):
            super().__init__()
            c_ = c2 // 2
            self.cv1 = TConv(c1, c_, 1)
            self.cv2 = TConv(c1, c_, 1)
            self.cv3 = TConv(2 * c_, c2, 1)
            self.m = torch.nn.Sequential(
                *[TBottle(c_, c_) if shortcut else TBottle(c_, c_, False)
                  for _ in range(n)])

        def forward(self, x):
            return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))

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

    w = [16, 32, 64, 128, 256]
    oracle = torch.nn.Sequential(
        TConv(3, w[0], 6, 2, 2), TConv(w[0], w[1], 3, 2),
        TC3(w[1], w[1], 1), TConv(w[1], w[2], 3, 2), TC3(w[2], w[2], 2),
        TConv(w[2], w[3], 3, 2), TC3(w[3], w[3], 3),
        TConv(w[3], w[4], 3, 2), TC3(w[4], w[4], 1), TSPPF(w[4], w[4], 5))
    osd = {}
    for k, v in sd.items():
        if k.startswith("model.24") or "num_batches" in k:
            continue
        idx = int(k.split(".")[1])
        if idx <= 9:
            osd[k[len("model."):]] = torch.from_numpy(v)
    missing, unexpected = oracle.load_state_dict(osd, strict=False)
    assert not unexpected
    oracle.eval()

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    # ---- ours: apply layers 0..9 with the mapped params ----
    cfg = ArchCfg(version="v5u", size="n", task="detect", nc=80)
    layers, _, _ = build_arch(cfg)
    h = jnp.asarray(x)
    for i in range(10):
        mod = layers[i][1]()
        sub = {"params": new_vars["params"][str(i)],
               "batch_stats": new_vars["batch_stats"][str(i)]}
        h = mod.apply(sub, h, False)
    got = np.asarray(h).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_variables_roundtrip_and_one2one():
    import jax
    import jax.numpy as jnp
    from yolosharp_tpu.nn import ArchCfg, YoloNet

    cfg = ArchCfg(version="v8", size="n", task="detect", nc=80, end2end=True)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(1),
                         jnp.zeros((1, 64, 64, 3)), train=False)
    sd = variables_to_state_dict(variables)
    assert not any("one2one" in k for k in sd)
    assert "model.22.dfl.conv.weight" in sd
    assert any(k.endswith("num_batches_tracked") for k in sd)

    # reload and check identity for a couple of tensors
    new_vars, report = state_dict_to_variables(sd, variables)
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["0"]["conv"]["kernel"]),
        np.asarray(variables["params"]["0"]["conv"]["kernel"]), rtol=1e-6)

    # one2one cloning copies cv2 -> one2one_cv2
    cloned = clone_one2one(new_vars)
    f = flatten(cloned["params"])
    np.testing.assert_allclose(f["22.one2one_cv2.0.2.kernel"],
                               f["22.cv2.0.2.kernel"])
