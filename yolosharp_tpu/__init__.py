"""yolosharp_tpu — TPU-native YOLO framework (JAX/XLA/Pallas).

A ground-up re-design of IntptrMax/YoloSharp's capabilities for TPU:
functional core (params as PyTrees), jitted train/eval/predict steps,
static shapes throughout, NHWC + bf16 compute, data-parallel over a
jax.sharding.Mesh.

Public API mirrors the reference (Models/YoloTask.cs):

    from yolosharp_tpu import Config, YoloTask, TaskType, YoloType, YoloSize
    task = YoloTask(Config(task_type=TaskType.detect, ...))
    task.load_model("yolov8n.safetensors")
    results = task.image_predict("bus.jpg")
    task.train()
"""

from .config import Config
from .types import (AutoAugmentType, ImageProcessType, KeyPoint, ScalarType,
                    TaskType, YoloResult, YoloSize, YoloType)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing YoloTask pulls in jax/flax; keep `import yolosharp_tpu`
    # light for config-only uses
    if name in ("YoloTask", "Detector", "Segmenter", "Obber", "PoseDetector",
                "Classifier"):
        from . import tasks

        return getattr(tasks, name)
    raise AttributeError(name)


__all__ = ["Config", "YoloTask", "TaskType", "YoloType", "YoloSize",
           "ScalarType", "ImageProcessType", "AutoAugmentType", "YoloResult",
           "KeyPoint"]
