"""Architecture zoo construction + forward-shape tests.

Checks every (version, task) at size n on a small input, verifies the raw
head-output shapes and that the flattened parameter paths follow the
Ultralytics/YoloSharp state-dict naming convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolosharp_tpu.nn import ArchCfg, YoloNet


def flat_names(params):
    out = []

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + [k])
            else:
                out.append(".".join(prefix + [k]))

    walk(params, [])
    return out


def init_model(cfg, hw=64, batch=1):
    net = YoloNet(cfg)
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    return net, variables, x


@pytest.mark.parametrize("version", ["v8", "v5u", "v11", "v12"])
def test_detect_forward_shapes(version):
    cfg = ArchCfg(version=version, size="n", task="detect", nc=80)
    net, variables, x = init_model(cfg)
    preds = net.apply(variables, x, train=False)
    o2m = preds["one2many"]
    assert len(o2m["box"]) == 3
    # 64px input -> P3 8x8, P4 4x4, P5 2x2
    assert o2m["box"][0].shape == (1, 8, 8, 64)
    assert o2m["cls"][0].shape == (1, 8, 8, 80)
    assert o2m["box"][2].shape == (1, 2, 2, 64)


def test_param_names_match_ultralytics_convention():
    cfg = ArchCfg(version="v8", size="n", task="detect")
    _, variables, _ = init_model(cfg)
    names = set(flat_names(variables["params"]))
    for expect in [
        "0.conv.kernel", "0.bn.scale", "1.conv.kernel",
        "2.cv1.conv.kernel", "2.m.0.cv1.conv.kernel", "9.cv2.conv.kernel",
        "22.cv2.0.0.conv.kernel", "22.cv2.0.2.kernel", "22.cv2.0.2.bias",
        "22.cv3.2.2.kernel",
    ]:
        assert expect in names, f"missing {expect}"
    stats = set(flat_names(variables["batch_stats"]))
    assert "0.bn.mean" in stats and "0.bn.var" in stats


def test_v8n_param_count_matches_ultralytics():
    cfg = ArchCfg(version="v8", size="n", task="detect", nc=80)
    _, variables, _ = init_model(cfg)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(
        variables["params"]))
    # Ultralytics YOLOv8n = 3,157,200 params incl. the 16 fixed DFL arange
    # weights, which live outside our param tree (decoded functionally).
    assert n == 3_157_200 - 16, n


def test_v5u_sppf_and_c3_names():
    cfg = ArchCfg(version="v5u", size="n", task="detect")
    _, variables, _ = init_model(cfg)
    names = set(flat_names(variables["params"]))
    for expect in ["9.cv1.conv.kernel", "9.cv2.conv.kernel",
                   "2.m.0.cv1.conv.kernel", "24.cv2.0.2.kernel"]:
        assert expect in names, f"missing {expect}"


@pytest.mark.parametrize("version", ["v8", "v11"])
def test_segment_head(version):
    cfg = ArchCfg(version=version, size="n", task="segment")
    net, variables, x = init_model(cfg)
    preds = net.apply(variables, x, train=False)
    o2m = preds["one2many"]
    assert o2m["mask"][0].shape == (1, 8, 8, 32)
    assert o2m["proto"].shape == (1, 16, 16, 32)  # P3 upsampled 2x


def test_obb_head_angle_range():
    cfg = ArchCfg(version="v8", size="n", task="obb")
    net, variables, x = init_model(cfg)
    preds = net.apply(variables, x, train=False)
    ang = np.asarray(preds["one2many"]["angle"][0])
    assert ang.shape == (1, 8, 8, 1)
    assert ang.min() >= -np.pi / 4 - 1e-5 and ang.max() <= 3 * np.pi / 4 + 1e-5


def test_pose_head():
    cfg = ArchCfg(version="v8", size="n", task="pose", nc=1)
    net, variables, x = init_model(cfg)
    preds = net.apply(variables, x, train=False)
    assert preds["one2many"]["kpt"][0].shape == (1, 8, 8, 51)


@pytest.mark.parametrize("version", ["v8", "v5u", "v11", "v12"])
def test_classify_head(version):
    cfg = ArchCfg(version=version, size="n", task="classify", nc=10)
    net, variables, x = init_model(cfg)
    preds = net.apply(variables, x, train=False)
    assert preds["cls"].shape == (1, 10)


def test_end2end_dual_head():
    cfg = ArchCfg(version="v8", size="n", task="detect", end2end=True)
    net, variables, x = init_model(cfg)
    preds = net.apply(variables, x, train=False)
    assert "one2one" in preds
    assert preds["one2one"]["box"][0].shape == preds["one2many"]["box"][0].shape
    names = set(flat_names(variables["params"]))
    assert "22.one2one_cv2.0.2.kernel" in names


def test_train_mode_updates_batch_stats():
    cfg = ArchCfg(version="v8", size="n", task="detect")
    net, variables, x = init_model(cfg)
    x = jnp.ones_like(x) * 0.5
    _, updates = net.apply(variables, x, train=True, mutable=["batch_stats"])
    old = variables["batch_stats"]["0"]["bn"]["mean"]
    new = updates["batch_stats"]["0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_v12_area_attention_runs():
    cfg = ArchCfg(version="v12", size="n", task="detect")
    net, variables, x = init_model(cfg, hw=128)
    preds = net.apply(variables, x, train=False)
    assert preds["one2many"]["box"][0].shape == (1, 16, 16, 64)
