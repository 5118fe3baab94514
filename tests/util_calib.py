"""Shared test helper: make an untrained net produce NMS-visible
detections (activation variance collapses ~5x/layer through identity BN
stats, so raw random init scores are spatially constant and near zero).
Scale every conv kernel and randomize the head's final score convs —
the recipe of tests/test_golden_bus_predict.py:115-134."""

import re

import numpy as np

from yolosharp_tpu.ckpt.mapping import flatten, head_index, unflatten


def calibrate_task(task, seed: int = 3):
    """In-place: rescale conv kernels + randomize head cv2/cv3 finals of a
    BaseTask (or YoloTask.task) so image_predict yields candidates."""
    v = task._ensure_variables()
    params = flatten(v["params"])
    hidx = head_index(v["params"])
    prng = np.random.default_rng(seed)
    for key in list(params):
        if key.endswith(".conv.kernel"):
            params[key] = (np.asarray(params[key]) * 2.5).astype(np.float32)
        if re.match(rf"^{hidx}\.cv[23]\.\d\.2\.(kernel|bias)$", key):
            params[key] = prng.uniform(
                -0.3, 0.3, np.shape(params[key])).astype(np.float32)
    v = dict(v)
    v["params"] = unflatten(params, task.variables["params"])
    task.variables = v
    return task
