"""Select-then-decode exactness: decode_inference_topk + plain NMS must
reproduce decode_inference + NMS(pre_topk=k) for every head family.

The rewrite moves the top-k candidate selection BEFORE the DFL/anchor
decode, selecting on raw class logits (sigmoid is strictly monotone, so
ordering and the confidence threshold commute with the selection). It is
a pure perf transform of the predict chain (Head.cs:107-223 decode +
Ops.cs:239-282 conf-filter in the reference) and must be invisible in
results: same kept boxes, scores, classes, extras, and truncation flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolosharp_tpu.ops.nms import non_max_suppression
from yolosharp_tpu.predict import decode_inference, decode_inference_topk

B, NC, IMGSZ = 3, 7, 96
SHAPES = [(IMGSZ // s, IMGSZ // s) for s in (8, 16, 32)]  # A = 189
A = sum(h * w for h, w in SHAPES)
K = 64
CONF, IOU = 0.25, 0.45


def _branch(key, extras=()):
    """Random head maps with logits scaled so a realistic fraction of
    anchors clears the 0.25 threshold."""
    ks = jax.random.split(key, 16)
    mk = iter(ks)

    def maps(ch, scale=1.0):
        return [jax.random.normal(next(mk), (B, h, w, ch)) * scale
                for h, w in SHAPES]

    branch = {"box": maps(64, 1.5), "cls": maps(NC, 1.2)}
    if "mask" in extras:
        branch["mask"] = maps(4)
    if "kpt" in extras:
        branch["kpt"] = maps(6)  # kpt_num=2, kpt_dim=3
    if "angle" in extras:
        branch["angle"] = maps(1)
    return branch


def _old(branch, rotated, kw):
    dec = decode_inference(branch, nc=NC, **kw)
    return non_max_suppression(dec, CONF, IOU, nc=NC, pre_topk=K,
                               rotated=rotated)


def _new(branch, rotated, kw):
    dec, trunc = decode_inference_topk(branch, nc=NC, conf_thres=CONF,
                                       k=K, **kw)
    out = non_max_suppression(dec, CONF, IOU, nc=NC, rotated=rotated)
    return out._replace(truncated=out.truncated | trunc)


@pytest.mark.parametrize("extras,rotated,kw", [
    ((), False, {}),
    (("mask",), False, {}),
    (("kpt",), False, {"kpt_num": 2, "kpt_dim": 3}),
    (("angle",), True, {}),
], ids=["detect", "segment", "pose", "obb"])
def test_topk_decode_matches_full_decode(extras, rotated, kw):
    branch = _branch(jax.random.PRNGKey(42), extras)
    old = jax.device_get(_old(branch, rotated, kw))
    new = jax.device_get(_new(branch, rotated, kw))

    n_old = old.valid.sum(-1)
    assert (n_old == new.valid.sum(-1)).all()
    assert int(n_old.sum()) > 3, "degenerate workload — test proves nothing"
    for i in range(B):
        n = int(n_old[i])
        np.testing.assert_allclose(new.boxes[i][:n], old.boxes[i][:n],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(new.scores[i][:n], old.scores[i][:n],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(new.classes[i][:n], old.classes[i][:n])
        np.testing.assert_allclose(new.extras[i][:n], old.extras[i][:n],
                                   rtol=1e-5, atol=1e-4)


def test_topk_decode_truncation_flag():
    """With K smaller than the above-threshold candidate count the flag
    must fire (and the old path's flag must agree)."""
    branch = _branch(jax.random.PRNGKey(7))
    # push every anchor above threshold
    branch["cls"] = [c + 4.0 for c in branch["cls"]]
    small = 8
    dec, trunc = decode_inference_topk(branch, nc=NC, conf_thres=CONF,
                                       k=small)
    assert dec.shape == (B, 4 + NC, small)
    assert bool(jnp.all(trunc))
    old = non_max_suppression(decode_inference(branch, nc=NC), CONF, IOU,
                              nc=NC, pre_topk=small)
    np.testing.assert_array_equal(np.asarray(trunc), np.asarray(old.truncated))


def test_topk_decode_k_clamped_to_anchor_count():
    branch = _branch(jax.random.PRNGKey(3))
    dec, trunc = decode_inference_topk(branch, nc=NC, conf_thres=CONF,
                                       k=10 ** 6)
    assert dec.shape == (B, 4 + NC, A)
    assert not bool(jnp.any(trunc))
