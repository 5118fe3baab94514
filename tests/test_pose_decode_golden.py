"""Golden: pose keypoint decode vs a torch replication of the reference
(Modules/Head.cs kpts_decode:595-609): x' = (x*2 + (ax-0.5))*stride,
y' likewise, visibility sigmoid."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yolosharp_tpu.predict import decode_inference  # noqa: E402


def test_pose_decode_matches_reference():
    rng = np.random.default_rng(0)
    nc, K, kd = 4, 17, 3
    shapes = [(8, 8), (4, 4), (2, 2)]
    strides = [8, 16, 32]
    b = 2
    branch = {
        "box": tuple(np.asarray(rng.standard_normal((b, h, w, 64)),
                                np.float32) for h, w in shapes),
        "cls": tuple(np.asarray(rng.standard_normal((b, h, w, nc)),
                                np.float32) for h, w in shapes),
        "kpt": tuple(np.asarray(rng.standard_normal((b, h, w, K * kd)),
                                np.float32) for h, w in shapes),
    }
    dec = np.asarray(decode_inference(branch, nc=nc, kpt_num=K, kpt_dim=kd))
    got = dec[:, 4 + nc:, :]                           # (B, K*kd, A)

    # ---- torch replication
    kpts = torch.cat([torch.from_numpy(k).permute(0, 3, 1, 2).flatten(2)
                      for k in branch["kpt"]], -1)     # (B, K*kd, A)
    ax, ay, st = [], [], []
    for (h, w), s in zip(shapes, strides):
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        ax.append(xs.flatten() + 0.5)
        ay.append(ys.flatten() + 0.5)
        st.append(torch.full((h * w,), float(s)))
    ax, ay, st = torch.cat(ax), torch.cat(ay), torch.cat(st)
    y = kpts.clone()
    y[:, 2::kd] = y[:, 2::kd].sigmoid()
    y[:, 0::kd] = (y[:, 0::kd] * 2.0 + (ax - 0.5)) * st
    y[:, 1::kd] = (y[:, 1::kd] * 2.0 + (ay - 0.5)) * st

    np.testing.assert_allclose(got, y.numpy(), rtol=1e-5, atol=1e-5)
