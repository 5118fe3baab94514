"""E2E inference-only mode: skip_one2many removes the one2many towers
from the traced predict graph for every detection-family task.

Reference behavior: at NMS-free predict only the one2one branch is
consumed (Head.cs:117-127); executing the one2many towers there is dead
compute. Asserted structurally: the lowered HLO of the skip graph has
strictly fewer convolutions, and the preds dict drops the one2many entry
while keeping everything decode needs (incl. the shared Segment proto).
"""

import jax
import jax.numpy as jnp
import pytest

from yolosharp_tpu.nn import ArchCfg, YoloNet


def _count_convs(net, variables, x, skip):
    def f(v, x):
        return net.apply(v, x, False, skip_one2many=skip)

    txt = jax.jit(f).lower(variables, x).as_text()
    return txt.count("stablehlo.convolution")


@pytest.mark.parametrize("task", ["detect", "segment", "obb", "pose"])
def test_skip_one2many_prunes_towers(task):
    cfg = ArchCfg(version="v8", size="n", task=task, nc=4, end2end=True)
    net = YoloNet(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, False)

    preds_full = net.apply(variables, x, False)
    preds_skip = net.apply(variables, x, False, skip_one2many=True)
    assert "one2many" in preds_full and "one2one" in preds_full
    assert "one2many" not in preds_skip and "one2one" in preds_skip
    # decode inputs intact: same one2one structure as the full pass
    assert set(preds_skip["one2one"].keys()) \
        == set(preds_full["one2one"].keys())
    if task == "segment":
        assert preds_skip["one2one"]["proto"].shape \
            == preds_full["one2one"]["proto"].shape

    n_full = _count_convs(net, variables, x, skip=False)
    n_skip = _count_convs(net, variables, x, skip=True)
    # each of 3 FPN levels loses >= 3 tower convs (cv2+cv3[+cv4])
    assert n_skip <= n_full - 9, (task, n_full, n_skip)
