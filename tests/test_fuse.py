"""Tests for pure-params transforms: bias_init priors and Conv+BN folding."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosharp_tpu.ckpt.fuse import bias_init, fold_bn
from yolosharp_tpu.ckpt.mapping import flatten
from yolosharp_tpu.nn import ArchCfg, YoloNet


def _init(cfg, hw=64):
    net = YoloNet(cfg)
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    return net, net.init(jax.random.PRNGKey(0), x, False), x


def test_bias_init_sets_priors():
    cfg = ArchCfg(version="v8", size="n", task="detect", nc=20, end2end=True)
    net, variables, _ = _init(cfg)
    out = bias_init(variables, nc=20, imgsz=640)
    f = flatten(out["params"])
    np.testing.assert_allclose(f["22.cv2.0.2.bias"], 1.0)
    np.testing.assert_allclose(f["22.one2one_cv2.1.2.bias"], 1.0)
    want0 = math.log(5 / 20 / (640 / 8) ** 2)
    want2 = math.log(5 / 20 / (640 / 32) ** 2)
    np.testing.assert_allclose(f["22.cv3.0.2.bias"], want0, rtol=1e-6)
    np.testing.assert_allclose(f["22.cv3.2.2.bias"], want2, rtol=1e-6)
    # non-head params untouched
    np.testing.assert_array_equal(
        f["0.conv.kernel"], flatten(variables["params"])["0.conv.kernel"])


def test_fold_bn_preserves_eval_outputs():
    cfg = ArchCfg(version="v8", size="n", task="detect", nc=8)
    net, variables, x = _init(cfg)
    # jitter stats so folding is non-trivial
    import jax.tree_util as jtu

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
        variables["batch_stats"])

    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    before = net.apply(variables, xin, False)
    fused = fold_bn(variables)
    after = net.apply(fused, xin, False)
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(after["one2many"]["box"][lvl]),
            np.asarray(before["one2many"]["box"][lvl]), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(after["one2many"]["cls"][lvl]),
            np.asarray(before["one2many"]["cls"][lvl]), rtol=2e-3, atol=2e-3)


def test_fused_inference_mode_matches_unfused():
    """fused_inference() + fold_bn == plain eval forward (FoldedBN skips
    the trivial BN entirely; must be numerically equivalent in fp32)."""
    from yolosharp_tpu.nn import fused_inference

    cfg = ArchCfg(version="v8", size="n", task="segment", nc=8)
    net, variables, x = _init(cfg)
    import jax.tree_util as jtu

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
        variables["batch_stats"])

    rng = np.random.default_rng(1)
    xin = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    before = net.apply(variables, xin, False)
    fused_vars = fold_bn(variables)
    with fused_inference():
        after = net.apply(fused_vars, xin, False)
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_head_fuse_matches_plain_fused():
    """head_fuse(): the per-level cv2/cv3 first-conv concat rewrite ==
    the plain fused forward (exact — output-axis kernel concat), incl.
    the E2E dual-head towers."""
    from yolosharp_tpu.nn import fused_inference
    from yolosharp_tpu.nn.common import head_fuse

    import jax.tree_util as jtu

    cfg = ArchCfg(version="v8", size="n", task="detect", nc=8,
                  end2end=True)
    net, variables, _ = _init(cfg)
    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
        variables["batch_stats"])
    rng = np.random.default_rng(37)
    xin = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    fused_vars = fold_bn(variables)
    with fused_inference():
        before = net.apply(fused_vars, xin, False)
    with fused_inference(), head_fuse():
        after = net.apply(fused_vars, xin, False)
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_s2d_repack_exact():
    """space_to_depth2 + repacked 2x2/s1 kernel == original 3x3/s2 conv
    (nn/common.py s2d rewrite; reference stem semantics Convs.cs:44-62)."""
    from yolosharp_tpu.nn.common import repack_s2d_kernel, space_to_depth2

    rng = np.random.default_rng(2)
    for c_in, c_out, hw in [(3, 16, 64), (16, 32, 32), (3, 8, 10)]:
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c_in)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, c_in, c_out)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = jax.lax.conv_general_dilated(
            space_to_depth2(x), repack_s2d_kernel(k), (1, 1),
            ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert got.shape == ref.shape == (2, hw // 2, hw // 2, c_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_s2d_stem_matches_plain_forward():
    """Full-model fused predict with the s2d stem rewrite == plain eval
    forward; also with max_cin=64 (rewrites every backbone downsample)."""
    from yolosharp_tpu.nn import fused_inference
    from yolosharp_tpu.nn.common import s2d_stride2

    cfg = ArchCfg(version="v8", size="n", task="detect", nc=8)
    net, variables, _ = _init(cfg)
    import jax.tree_util as jtu

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
        variables["batch_stats"])
    rng = np.random.default_rng(3)
    xin = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    before = net.apply(variables, xin, False)
    fused_vars = fold_bn(variables)
    for max_cin in (3, 64):
        with fused_inference(), s2d_stride2(max_cin):
            after = net.apply(fused_vars, xin, False)
        flat_b = jax.tree_util.tree_leaves(before)
        flat_a = jax.tree_util.tree_leaves(after)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_s2d_repack6_exact():
    """repack_s2d_kernel6: 6x6/s2/p2 conv (the v5u stem, Yolo.cs:137-198)
    == 3x3/s1/p1 conv with the repacked kernel over the s2d input."""
    from yolosharp_tpu.nn.common import repack_s2d_kernel6, space_to_depth2

    rng = np.random.default_rng(7)
    for c_in, c_out, hw in [(3, 16, 64), (3, 8, 10)]:
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c_in)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(6, 6, c_in, c_out)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = jax.lax.conv_general_dilated(
            space_to_depth2(x), repack_s2d_kernel6(k), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert got.shape == ref.shape == (2, hw // 2, hw // 2, c_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_s2d_packed_input_matches_plain_forward():
    """Full-model fused predict on a HOST-packed space-to-depth input
    (s2d_packed_input: stem runs as the exact stride-1 repacked conv, no
    in-graph transpose) == plain eval forward on the raw image — for the
    3x3/s2 stem (v8) and the 6x6/s2/p2 stem (v5u)."""
    from yolosharp_tpu.nn import fused_inference
    from yolosharp_tpu.nn.common import host_space_to_depth2, s2d_packed_input

    import jax.tree_util as jtu

    for version in ("v8", "v5u"):
        cfg = ArchCfg(version=version, size="n", task="detect", nc=8)
        net, variables, _ = _init(cfg)
        variables = dict(variables)
        variables["batch_stats"] = jtu.tree_map_with_path(
            lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
            variables["batch_stats"])
        rng = np.random.default_rng(5)
        xin = np.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), np.float32)
        before = net.apply(variables, jnp.asarray(xin), False)
        fused_vars = fold_bn(variables)
        packed = jnp.asarray(host_space_to_depth2(xin))
        assert packed.shape == (1, 32, 32, 12)
        with fused_inference(), s2d_packed_input():
            after = net.apply(fused_vars, packed, False)
        flat_b = jax.tree_util.tree_leaves(before)
        flat_a = jax.tree_util.tree_leaves(after)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_s2d_deep_repack_exact():
    """repack_s2d_kernel_deep: packed-in, packed-OUT stem conv (stride-2
    over the s2d input emitting the s2d output) == s2d of the original
    stride-2 conv, for the 3x3/p1 and 6x6/p2 (v5u) stems; chaining with a
    consuming repack_s2d_kernel conv reproduces stem+conv1 exactly."""
    from yolosharp_tpu.nn.common import (repack_s2d_kernel,
                                         repack_s2d_kernel_deep,
                                         space_to_depth2)

    rng = np.random.default_rng(13)
    conv = lambda x, w, s, pad: jax.lax.conv_general_dilated(
        x, w, (s, s) if isinstance(s, int) else s, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for k, p in [(3, 1), (6, 2)]:
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, 3, 5)), jnp.float32)
        ref = space_to_depth2(conv(x, w, 2, ((p, p), (p, p))))
        wd, pad = repack_s2d_kernel_deep(w, p)
        got = conv(space_to_depth2(x), wd, 2, pad)
        assert got.shape == ref.shape == (2, 8, 8, 20)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    # stem(3x3/s2) -> conv1(3x3/s2) chain entirely in packed space
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(3, 3, 3, 4)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    ref = conv(conv(x, w0, 2, ((1, 1), (1, 1))), w1, 2, ((1, 1), (1, 1)))
    wd, pad = repack_s2d_kernel_deep(w0, 1)
    z = conv(space_to_depth2(x), wd, 2, pad)
    got = conv(z, repack_s2d_kernel(w1), 1, ((1, 0), (1, 0)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_s2d_deep_packed_matches_plain_forward():
    """Full-model fused predict under s2d_packed_input(deep=True) — stem
    emits space-to-depth, conv1 consumes it, no in-graph transpose — ==
    plain eval forward, for the 3x3 stem (v8) and 6x6 stem (v5u)."""
    from yolosharp_tpu.nn import fused_inference
    from yolosharp_tpu.nn.common import host_space_to_depth2, s2d_packed_input

    import jax.tree_util as jtu

    for version in ("v8", "v5u"):
        cfg = ArchCfg(version=version, size="n", task="detect", nc=8)
        net, variables, _ = _init(cfg)
        variables = dict(variables)
        variables["batch_stats"] = jtu.tree_map_with_path(
            lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
            variables["batch_stats"])
        rng = np.random.default_rng(17)
        xin = np.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), np.float32)
        before = net.apply(variables, jnp.asarray(xin), False)
        fused_vars = fold_bn(variables)
        packed = jnp.asarray(host_space_to_depth2(xin))
        with fused_inference(), s2d_packed_input(deep=True):
            after = net.apply(fused_vars, packed, False)
        flat_b = jax.tree_util.tree_leaves(before)
        flat_a = jax.tree_util.tree_leaves(after)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_native_s2d_pack_matches_numpy():
    """native.s2d_pack_u8 (C++ threaded) == space_to_depth2 semantics."""
    from yolosharp_tpu.native import s2d_pack_u8
    from yolosharp_tpu.nn.common import host_space_to_depth2

    rng = np.random.default_rng(11)
    x = rng.integers(0, 255, (3, 64, 96, 3), np.uint8)
    got = s2d_pack_u8(x)
    ref = host_space_to_depth2(x)
    assert got.shape == (3, 32, 48, 12)
    assert np.array_equal(got, ref)


def test_fused_inference_flag_scoping():
    from yolosharp_tpu.nn import fused_inference, fused_inference_active

    assert not fused_inference_active()
    with fused_inference():
        assert fused_inference_active()
    assert not fused_inference_active()


def test_s2d_p2p_repack_exact():
    """repack_s2d_kernel_p2p: packed-in packed-OUT equivalents of the
    1x1/s1, 3x3/s1 and 3x3/s2 convs (the deeper-region primitives), in
    both channel orderings, == s2d of the original conv."""
    from yolosharp_tpu.nn.common import repack_s2d_kernel_p2p, space_to_depth2

    rng = np.random.default_rng(23)
    conv = lambda x, w, s, pad: jax.lax.conv_general_dilated(
        x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def to_cmajor(z):
        b, h, w, ch = z.shape                       # (py,px,c) p-major
        return z.reshape(b, h, w, 4, ch // 4).transpose(
            0, 1, 2, 4, 3).reshape(b, h, w, ch)     # -> (c,py,px) c-major

    for k, s in [(1, 1), (3, 1), (3, 2)]:
        p = k // 2
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 6)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, 6, 5)), jnp.float32)
        ref = space_to_depth2(conv(x, w, s, ((p, p), (p, p))))
        xp = space_to_depth2(x)
        for in_o in ("p", "c"):
            for out_o in ("p", "c"):
                wk, pad = repack_s2d_kernel_p2p(w, stride=s, p=p,
                                                in_order=in_o,
                                                out_order=out_o)
                xin = to_cmajor(xp) if in_o == "c" else xp
                got = conv(xin, wk, s, pad)
                want = to_cmajor(ref) if out_o == "c" else ref
                assert got.shape == want.shape, (k, s, in_o, out_o)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want),
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"k={k} s={s} {in_o}->{out_o}")


@pytest.mark.parametrize("version,size,depth",
                         [("v8", "n", 1), ("v8", "n", 2),
                          ("v5u", "n", 1), ("v5u", "n", 2),
                          ("v11", "n", 1), ("v11", "n", 2),
                          ("v12", "n", 1), ("v12", "n", 2),
                          # m sizes: C3k2 with C3k inner blocks on the
                          # packed grid (_PackedC3k)
                          ("v11", "m", 1), ("v11", "m", 2)])
def test_s2d_deeper_packed_matches_plain_forward(version, size, depth):
    """Full-model fused predict under s2d_packed_input(deeper=depth) —
    stem and the next `depth` stride-2 convs emit space-to-depth packed
    and the CSP block after each (C2f / C3k2 / C3) runs entirely on the
    packed grid (parity-diagonal 1x1s + 3-tap packed 3x3s), then the next
    stride-2 conv consumes — == plain eval forward (exercises shortcut
    adds, split/concat in c-major, the parallel-branch C3, the e=0.25
    C3k2, and both boundary orderings)."""
    from yolosharp_tpu.nn import fused_inference
    from yolosharp_tpu.nn.common import host_space_to_depth2, s2d_packed_input

    import jax.tree_util as jtu

    cfg = ArchCfg(version=version, size=size, task="detect", nc=8)
    net, variables, _ = _init(cfg)
    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        lambda p, v: v + 0.1 if p[-1].key == "mean" else v * 1.5 + 0.01,
        variables["batch_stats"])
    rng = np.random.default_rng(29)
    xin = np.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), np.float32)
    before = net.apply(variables, jnp.asarray(xin), False)
    fused_vars = fold_bn(variables)
    packed = jnp.asarray(host_space_to_depth2(xin))
    with fused_inference(), s2d_packed_input(deeper=depth):
        after = net.apply(fused_vars, packed, False)
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("version,size,depth",
                         [("v8", "n", 1), ("v8", "n", 2),
                          ("v5u", "n", 2), ("v11", "n", 2),
                          # m size: _PackedC3k with real packed-axis BN
                          ("v11", "m", 2)])
def test_s2d_packed_train_matches_plain(version, size, depth):
    """TRAIN-mode packed region (make_train_step packed_depth): forward,
    parameter gradients AND updated BatchNorm stats under
    s2d_packed_input(allow_train=True) on the packed canvas == the plain
    train forward on the unpacked input. depth 1 = stem emits packed +
    conv1 consumes; depth 2 = conv1 emits too and the layer-2 CSP block
    (C2f / C3 / C3k2) runs on the packed grid with real parity-axis BN
    (nn/common.py packed_batch_norm)."""
    from yolosharp_tpu.nn.common import host_space_to_depth2, s2d_packed_input

    cfg = ArchCfg(version=version, size=size, task="detect", nc=8)
    net, variables, _ = _init(cfg)
    rng = np.random.default_rng(31)
    xin = np.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), np.float32)
    packed = jnp.asarray(host_space_to_depth2(xin))

    def make_loss(use_packed):
        def loss(params, x):
            import contextlib
            ctx = (s2d_packed_input(deep=depth >= 1,
                                    deeper=max(0, depth - 1),
                                    allow_train=True)
                   if use_packed else contextlib.nullcontext())
            with ctx:
                preds, upd = net.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, True, mutable=["batch_stats"])
            s = sum(jnp.sum(v * v)
                    for v in jax.tree_util.tree_leaves(preds))
            return s, upd["batch_stats"]
        return loss

    (l0, st0), g0 = jax.value_and_grad(make_loss(False), has_aux=True)(
        variables["params"], jnp.asarray(xin))
    (l1, st1), g1 = jax.value_and_grad(make_loss(True), has_aux=True)(
        variables["params"], packed)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        a, b = np.asarray(a), np.asarray(b)
        # atol scales with the leaf's magnitude: the untrained net's
        # sum-of-squares loss produces O(1e2) grads whose f32
        # reassociation noise (packed BN reduces the parity axis in a
        # different order) is relative to that scale, not absolute
        # (5e-4: v11 depth-2 showed 3.2e-4*max on a downstream bn leaf)
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=1e-4 + 5e-4 * float(np.abs(a).max()),
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(st0),
                            jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("version,size,depth",
                         [("v8", "n", 2), ("v11", "m", 2)])
def test_host_batch_packed_train_matches_plain(version, size, depth):
    """HOST-prepared batches (no aug_pool: letterbox trainings, the
    close-mosaic tail, and the w4/w5 family benches) get the packed train
    region via one in-graph uint8 space_to_depth2 in resolve_batch_images
    (train.py). The full make_train_step with packed_stem=True on a host
    `images` batch must produce the same loss/params/stats trajectory as
    the unpacked step.

    The loss here is a smooth pseudo-loss over every head output rather
    than detection_loss: TAL's top-k has near-ties on random data, so a
    1-ulp forward reassociation difference can flip an assignment and
    make the comparison discontinuous (observed flaky on CPU). The full
    detection-loss trajectory through the packed region is pinned by
    test_s2d_packed_train_matches_plain; this test verifies the HOST-path
    wiring (uint8 space_to_depth2 -> packed stem consume).

    SGD (not AdamW) keeps the comparison well-conditioned: AdamW's first
    step is ~lr*sign(grad), so elements whose true gradient is ~0 (pure
    reassociation noise) would get uncorrelated +-lr updates. With SGD
    the param delta is lr * grad-delta, i.e. the oracle really measures
    gradient parity."""
    import optax

    from yolosharp_tpu.train import TrainState, make_train_step

    cfg = ArchCfg(version=version, size=size, task="detect", nc=8)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(5),
                         jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    tx = optax.sgd(1e-3)
    rng = np.random.default_rng(7)
    batch = {
        "images": rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8),
        "cls": rng.integers(0, 8, (2, 4)).astype(np.int32),
        "bboxes": rng.uniform(0.2, 0.6, (2, 4, 4)).astype(np.float32),
        "mask_gt": np.ones((2, 4), bool),
    }

    def loss_fn(preds, b, **kw):
        leaves = jax.tree_util.tree_leaves(preds["one2many"])
        loss = sum(jnp.mean(jnp.square(x.astype(jnp.float32)))
                   for x in leaves)
        return loss, jnp.zeros((3,), jnp.float32)

    outs = []
    for packed in (False, True):
        step = make_train_step(net, loss_fn, compute_dtype=jnp.float32,
                               donate=False, packed_stem=packed,
                               packed_depth=depth if packed else 0)
        st = TrainState.create(variables, tx)
        st, loss, _ = step(st, batch, {})
        outs.append((float(loss), st))
    (l0, s0), (l1, s1) = outs
    np.testing.assert_allclose(l1, l0, rtol=2e-4)
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(s0.params),
            jax.tree_util.tree_leaves(s1.params)):
        # SGD step: param delta = lr * grad delta, so this bounds the
        # gradient disagreement between the packed and plain paths. atol
        # floor 1e-5 = grad diff 1e-2 at lr 1e-3: the packed BN reduces
        # over a different summation tree (parity axis exposed), giving
        # ~1e-6 reassociation-scale deltas on heavy-cancellation bias
        # grads; a wiring bug (wrong parity order) would be O(1e-3).
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3,
            atol=1e-5 + 1e-5 * float(np.abs(np.asarray(a)).max()),
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(s0.batch_stats),
            jax.tree_util.tree_leaves(s1.batch_stats)):
        # rtol 1e-3: f32 batch-mean/var reduce in a different layout
        # order; wiring bugs would be O(1) off
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(path)}")
