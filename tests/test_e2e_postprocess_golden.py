"""Golden: NMS-free End2End top-k select vs a torch replication of the
reference (Modules/Head.cs postprocess:117-127 + get_topk_index:175-196)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yolosharp_tpu.predict import e2e_postprocess  # noqa: E402


def _torch_postprocess(preds, nc, max_det):
    boxes, scores = preds.split([4, nc], dim=-1)
    b, a, _ = scores.shape
    k = min(max_det, a)
    ori_index = scores.max(dim=-1).values.topk(k, dim=1).indices \
        .unsqueeze(-1)                                      # (B, K, 1)
    g = scores.gather(1, ori_index.repeat(1, 1, nc))        # (B, K, nc)
    flat, index = g.flatten(1).topk(k)
    idx = ori_index[torch.arange(b)[..., None],
                    (index // nc).long()].squeeze(-1)       # (B, K)
    out_boxes = boxes.gather(1, idx.unsqueeze(-1).repeat(1, 1, 4))
    return torch.cat([out_boxes, flat.unsqueeze(-1),
                      (index % nc).float().unsqueeze(-1)], -1)


@pytest.mark.parametrize("a,nc,max_det", [(841, 7, 300), (120, 80, 300),
                                          (2100, 3, 100)])
def test_e2e_topk_matches_reference(a, nc, max_det):
    rng = np.random.default_rng(0)
    b = 3
    pred = np.concatenate([
        rng.uniform(0, 640, (b, a, 4)),
        rng.uniform(0, 1, (b, a, nc)),
    ], -1).astype(np.float32)

    ours = np.asarray(e2e_postprocess(pred, nc=nc, max_det=max_det))
    want = _torch_postprocess(torch.from_numpy(pred), nc, max_det).numpy()
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-6)


def test_e2e_extras_follow_their_anchor():
    """Extras (mask coeffs / kpts / angle) are gathered by the selected
    anchor, mirroring the seg/pose/obb E2E paths."""
    rng = np.random.default_rng(1)
    b, a, nc, e = 2, 500, 5, 3
    # encode the anchor id into the extras so gathering is verifiable
    extras = np.tile(np.arange(a, dtype=np.float32)[None, :, None],
                     (b, 1, e))
    pred = np.concatenate([
        rng.uniform(0, 64, (b, a, 4)).astype(np.float32),
        rng.uniform(0, 1, (b, a, nc)).astype(np.float32),
        extras,
    ], -1)
    out = np.asarray(e2e_postprocess(pred, nc=nc, max_det=50, extra=e))
    # re-derive each row's anchor from the score: find it in the source
    scores = pred[..., 4:4 + nc]
    for bi in range(b):
        for r in range(50):
            s, anchor_enc = out[bi, r, 4], out[bi, r, 6]
            assert np.isclose(
                scores[bi, int(anchor_enc), int(out[bi, r, 5])], s)
