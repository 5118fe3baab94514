"""Full-state resume round-trip: optimizer moments, BN stats, and step
counter must survive serialization exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosharp_tpu.ckpt.resume import restore_train_state, save_train_state
from yolosharp_tpu.loss import detection_loss
from yolosharp_tpu.nn import ArchCfg, YoloNet
from yolosharp_tpu.train import TrainState, make_optimizer, make_train_step


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_resume_roundtrip(tmp_path, backend):
    cfg = ArchCfg(version="v8", size="n", task="detect", nc=4)
    net = YoloNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         False)
    tx = make_optimizer(nc=4, epochs=3, steps_per_epoch=2)
    state = TrainState.create(variables, tx)

    def loss_fn(preds, batch):
        return detection_loss(preds["one2many"], batch, nc=4)

    step = make_train_step(net, loss_fn, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32),
        "cls": rng.integers(0, 4, (2, 4)).astype(np.int32),
        "bboxes": rng.uniform(0.3, 0.6, (2, 4, 4)).astype(np.float32),
        "mask_gt": np.ones((2, 4), bool),
    }
    state, _, _ = step(state, batch, {})
    state, _, _ = step(state, batch, {})

    if backend == "orbax":
        from yolosharp_tpu.ckpt.resume import save_train_state_orbax

        p = str(tmp_path / "state.orbax")
        save_train_state_orbax(p, state, {"epoch": 7})
    else:
        p = str(tmp_path / "state.npz")
        save_train_state(p, state, {"epoch": 7})

    fresh = TrainState.create(variables, tx)
    restored, meta = restore_train_state(p, fresh)  # auto-detects backend
    assert meta["epoch"] == 7
    assert int(restored.step) == int(state.step) == 2

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # next step from the restored state is identical to continuing
    s1, l1, _ = step(state, batch, {})
    s2, l2, _ = step(restored, batch, {})
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_dynamic_loss_scale_semantics():
    """fp16 AMP shim (Amp.cs:94-135): scale halves on a non-finite step
    (params untouched) and doubles after the growth interval. Uses a tiny
    conv net — the semantics live in make_train_step, not the model."""
    from flax import linen as fnn

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            y = fnn.Conv(4, (3, 3), name="c")(x)
            fnn.BatchNorm(use_running_average=not train, name="bn")(y)
            return y

    net = Tiny()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, 8, 3), jnp.float32), False)

    def loss_fn(preds, batch):
        # poison turns the loss (and grads) non-finite on demand
        return jnp.mean(preds ** 2) * batch["poison"], jnp.zeros((3,))

    tx = make_optimizer(nc=4, epochs=2, steps_per_epoch=4)
    state = TrainState.create({"params": variables["params"],
                               "batch_stats": variables["batch_stats"]},
                              tx, init_scale=65536.0)
    step = make_train_step(net, loss_fn, donate=False,
                           dynamic_loss_scale=True,
                           scale_growth_interval=2)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32),
        "poison": np.float32(1.0),
    }
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, loss, _ = step(state, batch, {})
    assert float(state.loss_scale) == 65536.0 and int(state.grow_count) == 1
    # non-finite step: scale halves, params keep their previous values
    p_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    bad = dict(batch, poison=np.float32(np.nan))
    state, loss, _ = step(state, bad, {})
    assert float(state.loss_scale) == 32768.0
    assert int(state.grow_count) == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]), p_before)
    # growth after interval consecutive finite steps
    state, *_ = step(state, batch, {})
    state, *_ = step(state, batch, {})
    assert float(state.loss_scale) == 65536.0  # grew back 32768 -> 65536
